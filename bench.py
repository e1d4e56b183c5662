"""End-to-end benchmark on the real TPU chip.

Replaces the reference's C++/OpenGL benchmark harness
(benchmark/src/main.cc:39-154) with the same stage taxonomy —
downsample / coefficient forward / guide / slice-apply / total — plus
the north-star metric: 4K enhancement frames/sec/chip (target >= 200 on
v5e, BASELINE.md) and raw slice-apply GPix/s.

The HEADLINE number is the full per-frame pipeline INCLUDING the
256x256 preview downsample, matching the reference's stage accounting
(processor.cc:103-137 runs cv::resize inside the measured iteration).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus a human-readable stage breakdown on stderr.

Timing method: the axon TPU tunnel adds a ~26 ms fixed dispatch+fetch
round trip per host call REGARDLESS of the work inside (measured by
scaling chain length), so every measurement chains `--iters`
data-dependent iterations inside one jitted computation and fetches one
scalar. At the default 100 iterations the tunnel overhead contributes
<0.3 ms/iter; production serving (local PJRT, no tunnel) has no such
per-call cost.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

TARGET_4K_FPS = 200.0  # BASELINE.md: >= 200 4K frames/sec/chip on v5e
HBM_PEAK_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def _timed_chain(fn, n, *args, burn=1, repeats=3):
  """Median-of-`repeats` of an n-iteration on-device chain; sec/iter.

  For stages whose output is small (scalar-sum feedback is cheap
  relative to the stage itself)."""
  import jax
  import jax.numpy as jnp

  @jax.jit
  def chain(*a):
    acc = jnp.zeros(())
    for _ in range(n):
      acc = acc + fn(*a, acc * 1e-30)
    return acc

  for _ in range(max(1, burn)):  # compile + warm (--burn, main.cc:31-37)
    float(chain(*args))
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(*args))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2]


def _timed_feedback_chain(fn, n, x0, *args, burn=1, repeats=3):
  """Median-of-3 sec/iter of x <- fn(x, *args), iterated on device.

  For full-res image->image stages: feeding the output image back as
  the next input creates the data dependency with ZERO added per-
  iteration work. The kernel pipeline is non-affine, so XLA cannot
  collapse the chain."""
  import jax

  # Unrolled on purpose: a fori_loop inserts loop-carry copies of the
  # full-res image (~0.6 ms/iter at 4K), which is exactly the kind of
  # overhead this chain exists to avoid.
  @jax.jit
  def chain(x, *a):
    for _ in range(n):
      x = fn(x, *a)
    return x.reshape(-1)[0]

  for _ in range(max(1, burn)):  # compile + warm (--burn)
    float(chain(x0, *args))
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(x0, *args))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2]


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--iters', type=int, default=100,
                      help='iterations per on-device chain '
                           '(reference --iters, main.cc:31-37); must be '
                           'large enough to amortize the ~26 ms tunnel '
                           'round trip')
  parser.add_argument('--burn', type=int, default=1,
                      help='warm-up chain invocations before timing '
                           '(reference --burn_iters)')
  parser.add_argument('--repeats', type=int, default=3,
                      help='timed chain invocations; median is reported')
  parser.add_argument('--stream', type=int, default=0, metavar='N',
                      help='also measure N-frame uint8 streaming '
                           '(Enhancer.stream): includes host link '
                           'transfers, which through the axon tunnel '
                           'measure the tunnel, not the chip')
  parser.add_argument('--stages', action='store_true',
                      help='also measure the isolated per-stage probes '
                           '(extra compiles; the derived in-context '
                           'stage costs are always reported)')
  args = parser.parse_args(argv)

  # Fail fast (exit 3) if the device link is wedged: a dead axon tunnel
  # hangs every device call in a futex wait, which would make this
  # benchmark block forever instead of reporting a diagnosable error.
  # The probe runs in a subprocess so the timeout also covers backend
  # initialization; 240 s covers a cold first-compile over the tunnel.
  # Tunnel outages are often transient (the round-3 capture failed on a
  # single probe while the tunnel came back the same day), so retry with
  # backoff inside a bounded window before giving up.
  import subprocess
  probe_ok = False
  last_err = None
  for attempt, backoff in enumerate((0, 60, 180)):
    if backoff:
      print(f'bench.py: liveness probe retry in {backoff} s '
            f'(attempt {attempt + 1}/3)...', file=sys.stderr)
      time.sleep(backoff)
    try:
      subprocess.run(
          [sys.executable, '-c',
           'import jax, jax.numpy as jnp;'
           'print(float(jax.jit(lambda a: (a * a + 1).sum())'
           '(jnp.ones((8, 8)))))'],
          check=True, timeout=240, stdout=subprocess.DEVNULL)
      probe_ok = True
      break
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
      last_err = e
      print(f'bench.py: device liveness probe failed ({e!r})',
            file=sys.stderr)
  if not probe_ok:
    print(f'bench.py: all liveness probes failed (last: {last_err!r}) — '
          'TPU tunnel down or backend broken; refusing to hang.',
          file=sys.stderr)
    return 3

  import jax
  # Persistent compile cache: the 100-iteration unrolled chains are
  # expensive to compile (~30-60 s each); cache them across runs.
  import os
  cache_dir = (os.environ.get('HDRNET_TPU_CACHE_DIR')
               or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'output', 'jax_cache_bench'))
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  import jax.numpy as jnp
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.ops import bilateral_slice_apply
  from hdrnet_tpu.ops.resize import resize_nearest

  err = lambda *a: print(*a, file=sys.stderr)
  dev = jax.devices()[0]
  err(f'device: {dev.device_kind} ({dev.platform})')

  rng = np.random.RandomState(0)
  cfg = ModelConfig(model_name='HDRNetCurves')
  model = make_model(cfg)

  H, W = 2160, 3840
  full4k = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  full1080 = jnp.asarray(rng.rand(1, 1080, 1920, 3), np.float32)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full4k)

  n = args.iters
  timed_chain = functools.partial(_timed_chain, burn=args.burn,
                                  repeats=args.repeats)
  timed_feedback_chain = functools.partial(
      _timed_feedback_chain, burn=args.burn, repeats=args.repeats)

  from hdrnet_tpu.inference import Enhancer
  enh = Enhancer(config=cfg, variables=variables)
  err(f'fused serving path: {enh.use_fused}')

  # --- fused slice-apply kernel alone (external guide); image feedback
  grid = jnp.asarray(rng.randn(1, 16, 16, 8, 3, 4) * 0.05, np.float32)
  guide4k = jnp.asarray(rng.rand(1, H, W), np.float32)
  t_slice = timed_feedback_chain(
      lambda f, g, gu: bilateral_slice_apply(g, gu, f), n, full4k,
      grid, guide4k)

  # --- end-to-end WITHOUT downsample (preview supplied externally)
  def e2e(f, l):
    return enh._forward(l, f, clip=True)
  t_4k = timed_feedback_chain(e2e, n, full4k, lowres)

  # --- HEADLINE: full pipeline incl. the per-frame preview downsample
  # (reference processor.cc:110-122 stage accounting).
  process = enh._process_fn()
  t_4k_full = timed_feedback_chain(lambda f: process(f, clip=True), n,
                                   full4k)
  t_1080 = timed_feedback_chain(lambda f: process(f, clip=True), n,
                                full1080)

  # --- whole-frame uint8 pipeline on-device (downsample + coeff net +
  # fused kernel with in-kernel dequant/requant). This is the
  # reference-faithful I/O accounting: its benchmark is uint8 end to
  # end (u8 OpenCV image -> u8 GL texture -> RGBA8 readback,
  # processor.cc:103-137, renderer.cc:227-253); the f32 headline above
  # is the strictly-harder all-float variant.
  u8_fn = enh.make_stream_fn((1, H, W, 3))
  full4k_u8 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.uint8))
  t_4k_u8 = timed_feedback_chain(lambda f: u8_fn(f), n, full4k_u8)

  # --- composite (unfused) model forward, for reference
  def e2e_composite(f, v, l):
    return jnp.clip(model.apply(v, l, f), 0.0, 1.0)
  t_4k_composite = timed_feedback_chain(e2e_composite, n, full4k,
                                         variables, lowres)

  # --- batched serving throughput (amortizes the coeff-net latency)
  bt = 4
  full4k_b = jnp.asarray(rng.rand(bt, H, W, 3), np.float32)
  t_4k_batch = timed_feedback_chain(lambda f: process(f, clip=True),
                                    max(n // 2, 50), full4k_b) / bt

  # --- optional: isolated stage probes (upper bounds: each carries its
  # own chain feedback overhead)
  stage_probe = {}
  if args.stages:
    t_down = timed_chain(
        lambda f, eps: resize_nearest(f + eps, (256, 256)).sum(), n,
        full4k)
    from hdrnet_tpu.models.hdrnet import CoefficientBackbone
    bb = CoefficientBackbone(cfg, 3, 4)
    bb_vars = {'params': variables['params']['coefficients']}
    t_coeff = timed_chain(
        lambda l, eps: bb.apply(bb_vars, l + eps).sum(), n, lowres)
    from hdrnet_tpu.models.guides import CurveGuide
    g_vars = {'params': variables['params']['guide']}
    guide_mod = CurveGuide()
    t_guide = timed_chain(
        lambda f, eps: guide_mod.apply(g_vars, f + eps).sum(), n, full4k)
    stage_probe = {'downsample_xla_probe': round(t_down * 1e3, 3),
                   'coefficient_net_probe': round(t_coeff * 1e3, 3),
                   'guide_4k_xla_probe': round(t_guide * 1e3, 3)}

  # --- optional: uint8 streaming with transfer/compute overlap --------
  t_stream = None
  if args.stream:
    frames = [(rng.rand(1, H, W, 3) * 255).astype(np.uint8)
              for _ in range(min(4, args.stream))]
    list(enh.stream(iter(frames[:2])))  # compile + warm
    t0 = time.time()
    k = 0
    for _ in enh.stream(frames[i % len(frames)]
                        for i in range(args.stream)):
      k += 1
    t_stream = (time.time() - t0) / k

  fps_4k_full = 1.0 / t_4k_full
  gpix = H * W / t_slice / 1e9
  # Achieved HBM traffic of the kernel: 3 input + 3 output f32 planes
  # + the guide plane (grid window stream is ~1% extra).
  kernel_bytes = (3 + 3 + 1) * 4 * H * W
  gbps = kernel_bytes / t_slice / 1e9

  err(f'slice-apply kernel : {t_slice * 1e3:7.2f} ms '
      f'({gpix:.2f} GPix/s; {gbps:.0f} GB/s = '
      f'{100 * gbps / HBM_PEAK_GBPS:.0f}% of HBM peak — VPU-bound)')
  err(f'e2e 4K w/o downsample : {t_4k * 1e3:7.2f} ms ({1 / t_4k:.1f} fps)')
  err(f'e2e 4K incl downsample: {t_4k_full * 1e3:7.2f} ms '
      f'({fps_4k_full:.1f} fps)  <-- HEADLINE')
  err(f'  derived downsample stage : {(t_4k_full - t_4k) * 1e3:6.2f} ms')
  err(f'  derived coeff-net+misc   : {(t_4k - t_slice) * 1e3:6.2f} ms')
  err(f'e2e 4K u8 frame pipe  : {t_4k_u8 * 1e3:7.2f} ms '
      f'({1 / t_4k_u8:.1f} fps; reference-faithful u8 I/O accounting)')
  err(f'e2e 4K composite      : {t_4k_composite * 1e3:7.2f} ms '
      f'({1 / t_4k_composite:.1f} fps)')
  err(f'e2e 1080p incl downsample: {t_1080 * 1e3:6.2f} ms '
      f'({1 / t_1080:.1f} fps)')
  err(f'4K throughput (batch {bt}): {1 / t_4k_batch:.1f} frames/s')
  for k, v in stage_probe.items():
    err(f'  probe {k}: {v} ms')
  if t_stream is not None:
    err(f'4K uint8 stream   : {t_stream * 1e3:7.2f} ms/frame '
        f'({1.0 / t_stream:.1f} fps incl. host link transfers)')

  print(json.dumps({
      'metric': '4k_e2e_fps_per_chip_incl_downsample',
      'value': round(fps_4k_full, 2),
      'unit': 'frames/sec',
      'vs_baseline': round(fps_4k_full / TARGET_4K_FPS, 4),
      'detail': {
          'fps_4k_no_downsample': round(1.0 / t_4k, 2),
          'fps_4k_u8_frame_pipeline': round(1.0 / t_4k_u8, 2),
          'fps_4k_composite': round(1.0 / t_4k_composite, 2),
          'fps_1080p': round(1.0 / t_1080, 2),
          'fps_4k_batched_throughput': round(1.0 / t_4k_batch, 2),
          **({'fps_4k_stream_uint8': round(1.0 / t_stream, 2)}
             if t_stream is not None else {}),
          'slice_apply_gpix_per_s': round(gpix, 3),
          'slice_apply_gbps': round(gbps, 1),
          'slice_apply_pct_hbm_peak': round(100 * gbps / HBM_PEAK_GBPS, 1),
          'stage_ms': {
              'slice_apply_4k': round(t_slice * 1e3, 3),
              'end_to_end_4k': round(t_4k * 1e3, 3),
              'end_to_end_4k_incl_downsample': round(t_4k_full * 1e3, 3),
              'end_to_end_4k_u8_frame_pipeline': round(t_4k_u8 * 1e3, 3),
              'end_to_end_4k_composite': round(t_4k_composite * 1e3, 3),
              'downsample_derived': round((t_4k_full - t_4k) * 1e3, 3),
              'coeff_net_misc_derived': round((t_4k - t_slice) * 1e3, 3),
              **stage_probe,
          },
      },
  }))


if __name__ == '__main__':
  sys.exit(main())
