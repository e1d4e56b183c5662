"""Real multi-process distributed training test (the multi-host proof).

The reference has no distributed runtime at all (SURVEY.md §5.8); this
framework's multi-host story is jax.distributed + a global mesh
(parallel/mesh.py). Single-process virtual meshes (conftest.py) cannot
exercise the process boundary, so this test launches TWO OS processes,
each owning 4 virtual CPU devices, joins them through
`initialize_distributed` (gloo collectives standing in for DCN), and
runs the production train step over the global 8-device mesh in both
pure-DP (8,1) and ('data','spatial') (4,2) layouts — asserting
numerical identity with a single-device step inside each worker (see
tests/mp_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_TIMEOUT_S = 420


def _free_port():
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_device():
  port = _free_port()
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  worker = os.path.join(repo, 'tests', 'mp_worker.py')
  env = dict(os.environ)
  # A fresh runtime per worker: drop the parent test process's forced
  # 8-device flag so the worker's own 4-device flag wins.
  env.pop('XLA_FLAGS', None)
  env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
  procs = [
      subprocess.Popen([sys.executable, worker, str(port), str(i), '2'],
                       cwd=repo, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=_TIMEOUT_S)
      outs.append(out)
  except subprocess.TimeoutExpired:
    for p in procs:
      p.kill()
    pytest.fail('multi-process workers timed out:\n' +
                '\n'.join(o or '' for o in outs))
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f'worker {i} failed:\n{out}'
    assert 'MPOK' in out, f'worker {i} missing MPOK:\n{out}'
  # Both workers computed the same reference loss from the same seed.
  losses = {line.split('loss=')[1].split()[0]
            for out in outs for line in out.splitlines() if 'MPOK' in line}
  assert len(losses) == 1, outs
