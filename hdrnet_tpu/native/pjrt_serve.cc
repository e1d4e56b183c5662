// Native PJRT serving driver for hdrnet_tpu exports.
//
// TPU-native counterpart of the reference's C++ deployment benchmark
// (benchmark/src/main.cc + processor.cc): where the reference loaded an
// optimized_graph.pb into a TensorFlow C++ session and rendered with
// OpenGL, this binary loads a StableHLO module exported by
// `python -m hdrnet_tpu.bin.export` and runs it through any PJRT C-API
// plugin (e.g. a TPU plugin .so) — no Python in the serving process.
//
// The fused Pallas slice-apply kernel is baked into the StableHLO as a
// TPU custom call, so "the renderer" ships inside the module; there is
// no GL analog to manage (cf. benchmark/src/renderer.cc).
//
// Usage:
//   pjrt_serve <module.mlir>
//       [--plugin /opt/axon/libaxon_pjrt.so]
//       [--compile_options <dir>/compile_options.pb]
//       [--manifest <module>.manifest.json]
//       [--inputs in0.bin,in1.bin]   raw little-endian f32, dense layout
//       [--output out.bin]           first output, raw f32
//       [--burn 3] [--iters 20]
//       [--report report.json]
//
// Stage taxonomy in the JSON report mirrors the reference's
// (processor.h:32-93): load/compile/upload/forward/readback.

#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

double NowMs() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_serve: FATAL: %s\n", msg.c_str());
  std::exit(1);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// ---------------------------------------------------------------------
// PJRT error handling
// ---------------------------------------------------------------------

const PJRT_Api* g_api = nullptr;

std::string ErrorMessage(PJRT_Error* err) {
  PJRT_Error_Message_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = err;
  g_api->PJRT_Error_Message(&args);
  std::string msg(args.message, args.message_size);
  PJRT_Error_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  return msg;
}

#define CHECK_PJRT(expr)                                            \
  do {                                                              \
    PJRT_Error* _err = (expr);                                      \
    if (_err != nullptr) Die(std::string(#expr) + ": " +            \
                             ErrorMessage(_err));                   \
  } while (0)

void AwaitEvent(PJRT_Event* event) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  CHECK_PJRT(g_api->PJRT_Event_Await(&args));
  PJRT_Event_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = event;
  CHECK_PJRT(g_api->PJRT_Event_Destroy(&d));
}

bool g_trace = std::getenv("PJRT_SERVE_TRACE") != nullptr;

void DestroyBuffer(PJRT_Buffer* b) {
  if (g_trace) std::fprintf(stderr, "  destroy %p\n", (void*)b);
  PJRT_Buffer_Destroy_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = b;
  CHECK_PJRT(g_api->PJRT_Buffer_Destroy(&args));
}

// ---------------------------------------------------------------------
// Minimal manifest parsing: the export writes a fixed-schema JSON
// ({"inputs": [{"shape": [..], "dtype": "float32"}, ...], ...}); this
// scanner only has to read that one schema, not general JSON.
// ---------------------------------------------------------------------

struct TensorSpec {
  enum DType { kF32, kS32, kU8 };
  std::vector<int64_t> dims;
  DType dtype = kF32;
  bool IsInt() const { return dtype == kS32; }
  int64_t ElementSize() const { return dtype == kU8 ? 1 : 4; }
  int64_t NumElements() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
  int64_t NumBytes() const { return NumElements() * ElementSize(); }
};

std::vector<TensorSpec> ParseSpecs(const std::string& json,
                                   const std::string& key) {
  std::vector<TensorSpec> specs;
  size_t at = json.find("\"" + key + "\"");
  if (at == std::string::npos) Die("manifest missing key " + key);
  size_t open = json.find('[', at);
  // The section ends at the matching ']' of the outer array.
  int depth = 0;
  size_t end = open;
  for (; end < json.size(); ++end) {
    if (json[end] == '[') depth++;
    if (json[end] == ']' && --depth == 0) break;
  }
  size_t pos = open;
  while (true) {
    size_t shape_at = json.find("\"shape\"", pos);
    if (shape_at == std::string::npos || shape_at > end) break;
    size_t s_open = json.find('[', shape_at);
    size_t s_close = json.find(']', s_open);
    TensorSpec spec;
    std::stringstream ss(json.substr(s_open + 1, s_close - s_open - 1));
    std::string tok;
    while (std::getline(ss, tok, ',')) spec.dims.push_back(std::stoll(tok));
    size_t dt_at = json.find("\"dtype\"", s_close);
    if (dt_at != std::string::npos && dt_at < end) {
      if (json.find("float32", dt_at) == dt_at + 10) {
        spec.dtype = TensorSpec::kF32;
      } else if (json.find("int32", dt_at) == dt_at + 10) {
        // e.g. the traced true-size operand of serve_any_fn exports.
        spec.dtype = TensorSpec::kS32;
      } else if (json.find("uint8", dt_at) == dt_at + 10) {
        // stream_fn exports: raw uint8 frames in and out (4x less
        // host-link traffic than f32 for the same image).
        spec.dtype = TensorSpec::kU8;
      } else {
        Die("only float32/int32/uint8 tensors supported; edit the export");
      }
    }
    specs.push_back(spec);
    pos = s_close;
  }
  if (specs.empty()) Die("no tensor specs under manifest key " + key);
  return specs;
}

}  // namespace

int main(int argc, char** argv) {
  std::string module_path, plugin_path = "/opt/axon/libaxon_pjrt.so";
  std::string manifest_path, compile_options_path, output_path, report_path;
  std::vector<std::string> input_paths, extra_options;
  int burn = 3, iters = 20;
  bool allow_chain = true;  // --chain 0: pristine inputs every iter
                            // (bogus timing, exact single-forward output)

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Die("missing value for " + a);
      return argv[++i];
    };
    if (a == "--plugin") plugin_path = next();
    else if (a == "--manifest") manifest_path = next();
    else if (a == "--compile_options") compile_options_path = next();
    else if (a == "--output") output_path = next();
    else if (a == "--report") report_path = next();
    else if (a == "--create_option") extra_options.push_back(next());
    else if (a == "--burn") burn = std::stoi(next());
    else if (a == "--chain") allow_chain = std::stoi(next()) != 0;
    else if (a == "--iters") iters = std::stoi(next());
    else if (a == "--inputs") {
      std::stringstream ss(next());
      std::string tok;
      while (std::getline(ss, tok, ',')) input_paths.push_back(tok);
    } else if (a.rfind("--", 0) == 0) Die("unknown flag " + a);
    else module_path = a;
  }
  if (module_path.empty())
    Die("usage: pjrt_serve <module.mlir> [--plugin .so] [--iters N] ...");
  if (manifest_path.empty()) {
    manifest_path = module_path;
    size_t dot = manifest_path.rfind(".mlir");
    if (dot != std::string::npos) manifest_path.resize(dot);
    manifest_path += ".manifest.json";
  }
  if (compile_options_path.empty()) {
    size_t slash = module_path.rfind('/');
    compile_options_path =
        (slash == std::string::npos ? std::string()
                                    : module_path.substr(0, slash + 1)) +
        "compile_options.pb";
  }

  const std::string manifest = ReadFile(manifest_path);
  std::vector<TensorSpec> in_specs = ParseSpecs(manifest, "inputs");
  std::vector<TensorSpec> out_specs = ParseSpecs(manifest, "outputs");

  // ---- plugin load -----------------------------------------------------
  double t0 = NowMs();
  void* dl = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!dl) Die(std::string("dlopen: ") + dlerror());
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(dl, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  g_api = get_api();
  std::fprintf(stderr, "plugin %s (PJRT API %d.%d)\n", plugin_path.c_str(),
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_PJRT(g_api->PJRT_Plugin_Initialize(&args));
  }

  // Client create options. Tunnel-style plugins (axon) refuse an empty
  // option list; these mirror what the Python registration passes
  // (remote_compile/topology/session_id/rank). `--create_option k=v`
  // appends or overrides; integer-looking values go as kInt64.
  std::vector<std::pair<std::string, std::string>> opt_kv;
  if (plugin_path.find("axon") != std::string::npos) {
    // Tunnel routing env (the Python registration hook exports these
    // inside each interpreter; a standalone binary must set its own):
    // route pool lookups and claim Redirects back through the local
    // relay — the only network path in a zero-egress container.
    if (std::getenv("PALLAS_AXON_POOL_IPS")) {
      setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", /*overwrite=*/0);
      setenv("AXON_LOOPBACK_RELAY", "1", 0);
      setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
    }
    const char* topo = std::getenv("AXON_TOPOLOGY");
    std::string gen = std::getenv("PALLAS_AXON_TPU_GEN")
                          ? std::getenv("PALLAS_AXON_TPU_GEN")
                          : "v5e";
    opt_kv = {{"remote_compile", "1"},
              {"local_only", "0"},
              {"priority", "0"},
              {"topology", topo ? topo : gen + ":1x1x1"},
              {"n_slices", "1"},
              {"session_id", "pjrt-serve-" +
                                 std::to_string((long long)getpid()) + "-" +
                                 std::to_string((long long)NowMs())},
              {"rank", "4294967295"}};
  }
  for (const auto& kv : extra_options) {
    size_t eq = kv.find('=');
    if (eq == std::string::npos) Die("--create_option expects key=value");
    std::string k = kv.substr(0, eq), v = kv.substr(eq + 1);
    bool replaced = false;
    for (auto& p : opt_kv)
      if (p.first == k) { p.second = v; replaced = true; }
    if (!replaced) opt_kv.emplace_back(k, v);
  }
  std::vector<PJRT_NamedValue> create_options;
  std::vector<int64_t> int_storage(opt_kv.size());
  for (size_t i = 0; i < opt_kv.size(); ++i) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opt_kv[i].first.c_str();
    nv.name_size = opt_kv[i].first.size();
    const std::string& v = opt_kv[i].second;
    bool is_int = !v.empty() &&
                  v.find_first_not_of("0123456789") == std::string::npos;
    if (is_int) {
      int_storage[i] = std::stoll(v);
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = int_storage[i];
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
    create_options.push_back(nv);
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = create_options.data();
    args.num_options = create_options.size();
    CHECK_PJRT(g_api->PJRT_Client_Create(&args));
    client = args.client;
  }
  {
    PJRT_Client_PlatformName_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
    args.client = client;
    CHECK_PJRT(g_api->PJRT_Client_PlatformName(&args));
    std::fprintf(stderr, "platform: %.*s\n", (int)args.platform_name_size,
                 args.platform_name);
  }
  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    CHECK_PJRT(g_api->PJRT_Client_AddressableDevices(&args));
    if (args.num_addressable_devices == 0) Die("no addressable devices");
    device = args.addressable_devices[0];
  }
  double t_init = NowMs();

  // ---- compile ---------------------------------------------------------
  const std::string code = ReadFile(module_path);
  const std::string copts = ReadFile(compile_options_path);
  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(code.data());
    program.code_size = code.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &program;
    args.compile_options = copts.data();
    args.compile_options_size = copts.size();
    CHECK_PJRT(g_api->PJRT_Client_Compile(&args));
    exec = args.executable;
  }
  double t_compile = NowMs();
  std::fprintf(stderr, "compiled in %.1f ms\n", t_compile - t_init);

  // ---- upload inputs ---------------------------------------------------
  if (!input_paths.empty() && input_paths.size() != in_specs.size())
    Die("--inputs count does not match manifest input count");
  // Byte storage: f32/s32 are 4-byte elements (s32 lives bitwise in
  // the same layout), u8 is 1 byte.
  std::vector<std::vector<uint8_t>> host_inputs;
  for (size_t i = 0; i < in_specs.size(); ++i) {
    std::vector<uint8_t> buf(in_specs[i].NumBytes());
    if (!input_paths.empty()) {
      std::ifstream f(input_paths[i], std::ios::binary);
      if (!f) Die("cannot read input " + input_paths[i]);
      f.read(reinterpret_cast<char*>(buf.data()), buf.size());
      if (f.gcount() != (std::streamsize)buf.size())
        Die("input file " + input_paths[i] + " too small");
    } else if (in_specs[i].IsInt()) {
      // Synthetic value for an integer operand: only the serve_any_fn
      // convention is guessable — a 2-element true-(H, W) scalar pair,
      // defaulted to the padded extent of the largest rank-4 float
      // input (i.e. "the whole padded frame is valid").
      const TensorSpec* img = nullptr;
      for (const auto& s : in_specs)
        if (!s.IsInt() && s.dims.size() == 4 &&
            (!img || s.NumElements() > img->NumElements()))
          img = &s;
      if (in_specs[i].NumElements() != 2 || img == nullptr)
        Die("integer input " + std::to_string(i) +
            " needs explicit --inputs data");
      int32_t hw[2] = {(int32_t)img->dims[1], (int32_t)img->dims[2]};
      std::memcpy(buf.data(), hw, sizeof(hw));
      std::fprintf(stderr,
                   "int32 input %zu defaulted to full padded extent "
                   "(%d, %d)\n", i, hw[0], hw[1]);
    } else if (in_specs[i].dtype == TensorSpec::kU8) {
      // Synthetic photo-like uint8 frame.
      int64_t n = in_specs[i].NumElements();
      for (int64_t j = 0; j < n; ++j)
        buf[j] = (uint8_t)(127.5f + 127.5f * std::sin(j * 7.61e-5f) *
                                        std::cos(j * 1.13e-3f));
    } else {
      // Synthetic photo-like input: smooth gradients, [0, 1].
      float* fb = reinterpret_cast<float*>(buf.data());
      int64_t n = in_specs[i].NumElements();
      for (int64_t j = 0; j < n; ++j)
        fb[j] = 0.5f + 0.5f * std::sin(j * 7.61e-5f) *
                           std::cos(j * 1.13e-3f);
    }
    host_inputs.push_back(std::move(buf));
  }

  std::vector<PJRT_Buffer*> arg_buffers;
  for (size_t i = 0; i < in_specs.size(); ++i) {
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host_inputs[i].data();
    args.type = in_specs[i].dtype == TensorSpec::kS32 ? PJRT_Buffer_Type_S32
                : in_specs[i].dtype == TensorSpec::kU8 ? PJRT_Buffer_Type_U8
                                                       : PJRT_Buffer_Type_F32;
    args.dims = in_specs[i].dims.data();
    args.num_dims = in_specs[i].dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    CHECK_PJRT(g_api->PJRT_Client_BufferFromHostBuffer(&args));
    AwaitEvent(args.done_with_host_buffer);
    arg_buffers.push_back(args.buffer);
  }
  double t_upload = NowMs();
  std::fprintf(stderr, "inputs uploaded in %.1f ms\n", t_upload - t_compile);

  // ---- execute: burn + timed loop --------------------------------------
  // Tunnel-style PJRT clients are lazy: enqueued executions whose
  // results are never consumed can be elided, so a benchmark loop must
  // CHAIN iterations through a data dependency (output k feeds input
  // k+1) and force the chain with one readback — the same protocol the
  // Python bench uses. Chain through the first input whose shape
  // matches output 0 (the full-res image for enhance/serve modules).
  const size_t num_outputs = out_specs.size();
  int chain_idx = -1;
  if (allow_chain)
    for (size_t i = 0; i < in_specs.size(); ++i)
      if (!in_specs[i].IsInt() && in_specs[i].dims == out_specs[0].dims &&
          in_specs[i].dtype == out_specs[0].dtype) {
        chain_idx = (int)i;
        break;
      }
  std::fprintf(stderr, chain_idx >= 0
                           ? "chaining output 0 -> input %d\n"
                           : "no chainable input; timing includes a "
                             "per-iteration readback\n",
               chain_idx);

  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  std::vector<PJRT_Buffer*> graveyard;
  auto run_once = [&]() {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer** arg_list = arg_buffers.data();
    PJRT_Buffer* const* const* argument_lists = &arg_list;
    std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
    PJRT_Buffer** out_ptr = out_list.data();
    PJRT_Event* done = nullptr;

    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &opts;
    args.argument_lists = argument_lists;
    args.num_devices = 1;
    args.num_args = arg_buffers.size();
    args.output_lists = &out_ptr;
    args.device_complete_events = &done;
    CHECK_PJRT(g_api->PJRT_LoadedExecutable_Execute(&args));
    if (g_trace)
      std::fprintf(stderr, "  exec args[%p,%p] -> out %p\n",
                   (void*)arg_buffers[0],
                   (void*)(arg_buffers.size() > 1 ? arg_buffers[1] : nullptr),
                   (void*)out_list[0]);
    AwaitEvent(done);
    for (size_t i = 0; i < num_outputs; ++i) {
      if (i == 0) {
        // After the first chained step the previous output and the
        // chained arg are the same handle — retire exactly once.
        // Handles go to the graveyard instead of being destroyed here:
        // destroying a handle whose computation is still in flight
        // trips lazy tunnel clients; the graveyard drains after the
        // next readback (a full sync).
        PJRT_Buffer* old_out = outputs[0];
        outputs[0] = out_list[0];
        if (chain_idx >= 0) {
          if (arg_buffers[chain_idx] != old_out)
            graveyard.push_back(arg_buffers[chain_idx]);
          arg_buffers[chain_idx] = out_list[0];
        }
        if (old_out) graveyard.push_back(old_out);
      } else {
        graveyard.push_back(out_list[i]);
      }
    }
  };

  std::vector<uint8_t> host_out(out_specs[0].NumBytes());
  // Dense row-major host layout: with a null host_layout the copy
  // arrives in the buffer's device layout (TPU-tiled) — the values are
  // right but the element order is scrambled. Expressed as a tile-less
  // Tiled layout (minor_to_major = [rank-1..0]); stride layouts are not
  // universally supported by plugins.
  std::vector<int64_t> out_m2m(out_specs[0].dims.size());
  for (size_t i = 0; i < out_m2m.size(); ++i)
    out_m2m[i] = (int64_t)out_m2m.size() - 1 - i;
  auto read_back = [&]() {
    PJRT_Buffer_MemoryLayout layout;
    std::memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = out_m2m.data();
    layout.tiled.minor_to_major_size = out_m2m.size();

    PJRT_Buffer_ToHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    args.src = outputs[0];
    args.host_layout = &layout;
    args.dst = host_out.data();
    args.dst_size = host_out.size();
    CHECK_PJRT(g_api->PJRT_Buffer_ToHostBuffer(&args));
    AwaitEvent(args.event);
    for (PJRT_Buffer* b : graveyard) DestroyBuffer(b);
    graveyard.clear();
  };

  // Remote-tunnel plugins can report device-complete events ready before
  // the device work drains, so per-execute waits under-measure, and a
  // D2H readback over the tunnel is noisy enough (hundreds of ms) to
  // swamp single measurements. Two-point protocol: time (N executes +
  // readback) and (2N executes + readback), min of 3 runs each; the
  // difference isolates per-iteration forward cost from the D2H.
  for (int i = 0; i < burn; ++i) run_once();
  read_back();
  std::fprintf(stderr, "burn-in done\n");
  auto timed_block = [&](int n) {
    double best = 1e30;
    for (int rep = 0; rep < 3; ++rep) {
      double s = NowMs();
      for (int i = 0; i < n; ++i) run_once();
      read_back();
      best = std::min(best, NowMs() - s);
    }
    return best;
  };
  const double t_a = timed_block(iters);
  const double t_b = timed_block(2 * iters);
  double t_fetch_start = NowMs();
  read_back();  // already-ready buffer: D2H + round trip only
  double t_fetch = NowMs();

  double sum = 0;
  float mn = 0.f, mx = 0.f;
  const int64_t out_n = out_specs[0].NumElements();
  if (out_specs[0].dtype == TensorSpec::kU8) {
    mn = mx = out_n ? (float)host_out[0] : 0.f;
    for (int64_t j = 0; j < out_n; ++j) {
      float v = (float)host_out[j];
      sum += v;
      mn = std::min(mn, v);
      mx = std::max(mx, v);
    }
  } else {
    const float* fo = reinterpret_cast<const float*>(host_out.data());
    mn = mx = out_n ? fo[0] : 0.f;
    for (int64_t j = 0; j < out_n; ++j) {
      sum += fo[j];
      mn = std::min(mn, fo[j]);
      mx = std::max(mx, fo[j]);
    }
  }

  if (!output_path.empty()) {
    std::ofstream f(output_path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(host_out.data()),
            host_out.size());
  }

  const double readback_ms = t_fetch - t_fetch_start;
  const double forward_ms = (t_b - t_a) / iters;
  char report[1024];
  std::snprintf(
      report, sizeof(report),
      "{\"init_ms\": %.1f, \"compile_ms\": %.1f, \"upload_ms\": %.1f, "
      "\"forward_ms_per_iter\": %.3f, \"readback_ms\": %.1f, "
      "\"fps\": %.1f, \"iters\": %d, \"out_mean\": %.6f, "
      "\"out_min\": %.6f, \"out_max\": %.6f}",
      t_init - t0, t_compile - t_init, t_upload - t_compile, forward_ms,
      readback_ms, forward_ms > 0 ? 1000.0 / forward_ms : 0.0, iters,
      out_n ? sum / out_n : 0.0, mn, mx);
  std::printf("%s\n", report);
  if (!report_path.empty()) {
    std::ofstream f(report_path);
    f << report << "\n";
  }

  for (PJRT_Buffer* b : arg_buffers) DestroyBuffer(b);
  for (PJRT_Buffer* b : outputs)
    // When chaining, outputs[0] is the same handle as the chained arg
    // destroyed just above.
    if (b && (chain_idx < 0 || b != arg_buffers[chain_idx]))
      DestroyBuffer(b);
  {
    PJRT_LoadedExecutable_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.executable = exec;
    CHECK_PJRT(g_api->PJRT_LoadedExecutable_Destroy(&args));
  }
  {
    PJRT_Client_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.client = client;
    CHECK_PJRT(g_api->PJRT_Client_Destroy(&args));
  }
  return 0;
}
