"""Offline benchmark: batched greedy transcription throughput (RTF/chip).

Mirrors the reference's benchmark.py methodology (benchmark.py:126-207):
synthetic batch, warmup iterations, timed loop with device sync, RTF =
total audio seconds / wall seconds. Model: JasperNetBig with the on-device
log-mel frontend + greedy argmax, 6 s utterances @ 8 kHz (the reference's
online-benchmark config, benchmark_online.py:13-21).

Headline path: int8 PTQ inference (models/quantized.py — BN-folded
per-channel int8 weights, calibrated activation scales, convs on the MXU's
394-TOPS int8 path = 2x the bf16 peak; WER-unchanged + logit-tolerance
tested in tests/test_quantized.py). Falls back to the bf16 graph if
quantization raises, so the driver bench can never break.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is RTF / 10 — the north-star is >=10x real-time per chip
(BASELINE.json).
"""
import json
import time

import numpy as np


def main():
    from convasr_tpu.infra.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.ops.ctc import greedy_decode

    sample_rate = 8000
    duration_s = 6.0
    B = 256  # batch-scaling sweep: RTF 5546 @ B=64, 6043 @ 128, 8186 @ 256
    T = int(sample_rate * duration_s)

    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=sample_rate,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetBig', num_input_features=64, num_classes=(38,),
                         frontend=frontend, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    xlen = jnp.ones((B,), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, xlen)

    try:
        # int8 PTQ: calibration scales for THIS exact seeded setup are
        # committed (data/bench_act_scales.npz, regenerate with
        # scripts shown in git log) so the driver bench never pays the
        # calibration-program compile through the tunnel; falls back to
        # live calibration if the file is missing
        import os
        from convasr_tpu.models.quantized import (
            load_act_scales, quantize, quantize_for_inference, quantized_apply)
        calib = dict(x=np.asarray(x)[:16], xlen=np.asarray(xlen)[:16])
        scales_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   'data', 'bench_act_scales.npz')
        if os.path.exists(scales_path):
            qtree = jax.device_put(quantize(
                model, jax.tree.map(np.asarray, variables), batches=None,
                act_scales=load_act_scales(scales_path)))
        else:
            qtree = jax.device_put(quantize_for_inference(model, variables, [calib]))

        @jax.jit
        def transcribe(qtree, x, xlen):
            out = quantized_apply(model, qtree, x, xlen=xlen)
            return greedy_decode(out['log_probs'][0]), out['olen'][0]

        weights = qtree
    except Exception as e:
        print(f'int8 PTQ unavailable ({e!r}); falling back to bf16')

        @jax.jit
        def transcribe(variables, x, xlen):
            out = model.apply(variables, x, xlen=xlen)
            return greedy_decode(out['log_probs'][0]), out['olen'][0]

        weights = variables

    # warmup / compile. NOTE: on the tunneled 'axon' platform
    # block_until_ready does not synchronize reliably, so timing uses a full
    # host fetch of the (small) token output — which is also the honest
    # end-to-end transcription cost.
    for _ in range(3):
        np.asarray(transcribe(weights, x, xlen)[0])

    # double-buffered dispatch: fetch iteration i-1's tokens while the device
    # runs iteration i (the host fetch is the serving-side consumer)
    iters = 10
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        cur = transcribe(weights, x, xlen)
        if prev is not None:
            np.asarray(prev)
        prev = cur[0]
    np.asarray(prev)
    elapsed = time.perf_counter() - t0

    audio_seconds = B * duration_s * iters
    rtf = audio_seconds / elapsed
    print(json.dumps(dict(metric='transcribe_rtf_per_chip', value=round(rtf, 2),
                          unit='audio-sec/sec/chip',
                          vs_baseline=round(rtf / 10.0, 2))))


if __name__ == '__main__':
    main()
