"""convasr_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition framework.

A from-scratch rebuild of the capabilities of vadimkantorov/convasr (a
Wav2Letter/Jasper-style convolutional CTC recognizer) designed TPU-first:

- acoustic models are Flax modules laid out channels-last (B, T, C) so the
  lane dimension maps onto the 128-wide TPU vector registers and conv/matmul
  work lands on the MXU;
- the log-mel frontend is expressed as framing + two dense matmuls
  (DFT basis, mel basis) instead of FFT ops, which XLA tiles onto the MXU;
- CTC loss / alignment are time-scanned recursions vectorized over (batch,
  state) with a Pallas kernel for the hot path;
- scaling is SPMD over a `jax.sharding.Mesh` (data axis today; mesh axes are
  kept generic for future model axes) — collectives are inserted by XLA.

Reference behavior spec: /root/reference (vadimkantorov/convasr), cited in
docstrings as `file:line`.
"""

__version__ = '0.1.0'

# Public API (lazy imports keep `import convasr_tpu` light: no jax/flax until
# a device-side component is touched).
_SUBMODULES = {
    'audio': 'convasr_tpu.audio',
    'frontend': 'convasr_tpu.frontend',
    'text': 'convasr_tpu.text',
    'data': 'convasr_tpu.data',
    'models': 'convasr_tpu.models',
    'ops': 'convasr_tpu.ops',
    'decode': 'convasr_tpu.decode',
    'train': 'convasr_tpu.train',
    'parallel': 'convasr_tpu.parallel',
    'metrics': 'convasr_tpu.metrics',
    'infra': 'convasr_tpu.infra',
    'serve': 'convasr_tpu.serve',
    'vis': 'convasr_tpu.vis',
    'tools': 'convasr_tpu.tools',
    'cli': 'convasr_tpu.cli',
}


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib
        module = importlib.import_module(_SUBMODULES[name])
        globals()[name] = module
        return module
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
