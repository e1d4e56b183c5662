// Mock PJRT plugin: CI coverage for the native serving driver.
//
// The real deployment plugin is a TPU tunnel (and jaxlib ships no
// standalone CPU PJRT C-API .so in this image), so the driver's
// execute/readback loop — the part replacing the reference's TF C++
// session loop (benchmark/src/processor.cc:103-137) — would otherwise
// only ever run against hardware. This plugin implements exactly the
// PJRT C-API surface pjrt_serve uses, with deterministic semantics the
// test can audit:
//
//   * "compile" accepts any module text and yields an executable with
//     ONE output;
//   * "execute" computes out = arg0 + 1.0f elementwise (same shape);
//   * readback honours dst/dst_size with a plain dense copy.
//
// Because every execute increments by exactly 1, the driver's reported
// out_mean reveals precisely how many executions reached the device
// and whether output->input chaining and the deferred buffer
// graveyard handled handles correctly: expected mean = input mean +
// (burn + 3*iters + 3*2*iters) for a chainable module.
//
// Build: make -C hdrnet_tpu/native libmock_pjrt.so

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

// The header forward-declares these opaque types; the mock completes
// them with its own representations.
struct PJRT_Error {
  std::string message;
};
struct PJRT_Event {
  int unused;
};
struct PJRT_Device {
  int unused;
};
struct PJRT_Client {
  PJRT_Device device;
  PJRT_Device* device_list[1];
};
struct PJRT_Buffer {
  std::vector<float> data;      // f32/s32 elements (s32 rides bitwise)
  std::vector<uint8_t> u8;      // u8 elements (data empty in that case)
  std::vector<int64_t> dims;
};
struct PJRT_LoadedExecutable {
  int unused;
};

namespace {

void ErrorDestroy(PJRT_Error_Destroy_Args* args) {
  delete args->error;
}

void ErrorMessage(PJRT_Error_Message_Args* args) {
  args->message = args->error->message.c_str();
  args->message_size = args->error->message.size();
}

PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) {
  return nullptr;
}

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* args) {
  auto* c = new PJRT_Client();
  c->device_list[0] = &c->device;
  args->client = c;
  return nullptr;
}

PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args* args) {
  delete args->client;
  return nullptr;
}

PJRT_Error* ClientPlatformName(PJRT_Client_PlatformName_Args* args) {
  static const char kName[] = "mock_cpu";
  args->platform_name = kName;
  args->platform_name_size = sizeof(kName) - 1;
  return nullptr;
}

PJRT_Error* ClientAddressableDevices(
    PJRT_Client_AddressableDevices_Args* args) {
  args->addressable_devices = args->client->device_list;
  args->num_addressable_devices = 1;
  return nullptr;
}

PJRT_Error* ClientCompile(PJRT_Client_Compile_Args* args) {
  args->executable = new PJRT_LoadedExecutable();
  return nullptr;
}

PJRT_Error* BufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* args) {
  // S32 payloads ride bitwise in the float storage (both 4-byte);
  // U8 uses the byte storage.
  if (args->type != PJRT_Buffer_Type_F32 &&
      args->type != PJRT_Buffer_Type_S32 &&
      args->type != PJRT_Buffer_Type_U8)
    return new PJRT_Error{"mock plugin supports F32/S32/U8 only"};
  auto* b = new PJRT_Buffer();
  b->dims.assign(args->dims, args->dims + args->num_dims);
  int64_t n = 1;
  for (int64_t d : b->dims) n *= d;
  if (args->type == PJRT_Buffer_Type_U8) {
    b->u8.resize(n);
    std::memcpy(b->u8.data(), args->data, n);
  } else {
    b->data.resize(n);
    std::memcpy(b->data.data(), args->data, n * sizeof(float));
  }
  args->buffer = b;
  args->done_with_host_buffer = new PJRT_Event();
  return nullptr;
}

PJRT_Error* BufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* args) {
  if (!args->src->u8.empty()) {
    const size_t bytes = args->src->u8.size();
    if (args->dst == nullptr) {
      args->dst_size = bytes;
    } else {
      if (args->dst_size < bytes)
        return new PJRT_Error{"dst too small"};
      std::memcpy(args->dst, args->src->u8.data(), bytes);
    }
    args->event = new PJRT_Event();
    return nullptr;
  }
  const size_t bytes = args->src->data.size() * sizeof(float);
  if (args->dst == nullptr) {
    args->dst_size = bytes;
  } else {
    if (args->dst_size < bytes)
      return new PJRT_Error{"dst too small"};
    std::memcpy(args->dst, args->src->data.data(), bytes);
  }
  args->event = new PJRT_Event();
  return nullptr;
}

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* args) {
  // Poison before freeing: a use-after-destroy in the driver (e.g. a
  // graveyard bug) then corrupts results instead of passing silently.
  std::fill(args->buffer->data.begin(), args->buffer->data.end(), -1e30f);
  std::fill(args->buffer->u8.begin(), args->buffer->u8.end(),
            (uint8_t)0xEE);
  delete args->buffer;
  return nullptr;
}

PJRT_Error* ExecutableExecute(PJRT_LoadedExecutable_Execute_Args* args) {
  if (args->num_devices != 1)
    return new PJRT_Error{"mock plugin is single-device"};
  if (args->num_args < 1) return new PJRT_Error{"expected >= 1 arg"};
  const PJRT_Buffer* in = args->argument_lists[0][0];
  auto* out = new PJRT_Buffer();
  out->dims = in->dims;
  if (!in->u8.empty()) {
    out->u8.resize(in->u8.size());
    for (size_t i = 0; i < in->u8.size(); ++i)
      out->u8[i] = (uint8_t)(in->u8[i] + 1);  // countable, mod 256
  } else {
    out->data.resize(in->data.size());
    for (size_t i = 0; i < in->data.size(); ++i)
      out->data[i] = in->data[i] + 1.0f;  // countable: one per execute
  }
  args->output_lists[0][0] = out;
  if (args->device_complete_events)
    args->device_complete_events[0] = new PJRT_Event();
  return nullptr;
}

PJRT_Error* ExecutableDestroy(PJRT_LoadedExecutable_Destroy_Args* args) {
  delete args->executable;
  return nullptr;
}

PJRT_Error* EventAwait(PJRT_Event_Await_Args*) { return nullptr; }

PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* args) {
  delete args->event;
  return nullptr;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api;
  std::memset(&api, 0, sizeof(api));
  api.struct_size = PJRT_Api_STRUCT_SIZE;
  api.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
  api.pjrt_api_version.major_version = PJRT_API_MAJOR;
  api.pjrt_api_version.minor_version = PJRT_API_MINOR;
  api.PJRT_Error_Destroy = ErrorDestroy;
  api.PJRT_Error_Message = ErrorMessage;
  api.PJRT_Plugin_Initialize = PluginInitialize;
  api.PJRT_Client_Create = ClientCreate;
  api.PJRT_Client_Destroy = ClientDestroy;
  api.PJRT_Client_PlatformName = ClientPlatformName;
  api.PJRT_Client_AddressableDevices = ClientAddressableDevices;
  api.PJRT_Client_Compile = ClientCompile;
  api.PJRT_Client_BufferFromHostBuffer = BufferFromHostBuffer;
  api.PJRT_Buffer_ToHostBuffer = BufferToHostBuffer;
  api.PJRT_Buffer_Destroy = BufferDestroy;
  api.PJRT_LoadedExecutable_Execute = ExecutableExecute;
  api.PJRT_LoadedExecutable_Destroy = ExecutableDestroy;
  api.PJRT_Event_Await = EventAwait;
  api.PJRT_Event_Destroy = EventDestroy;
  return &api;
}
