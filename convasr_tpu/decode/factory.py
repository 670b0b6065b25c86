"""Decoder construction shared by the transcribe and train CLIs.

The reference parses --decoder/--decoder-topk/--lm/--beam-* in BOTH train.py
(train.py:975-995) and transcribe.py (transcribe.py:323-328) but never
instantiates a decoder from them in either driver (train.py uses the greedy
generator unconditionally, train.py:553; transcribe.py likewise) — the flag
only reaches the transcripts filename template (train.py:283). Here the flags
actually select the decoder used to produce hypotheses.
"""
import numpy as np


def build_decoder(args, tokenizer, vocab=None, mesh=None):
    """Returns None for GreedyDecoder (callers use the greedy CTC generator),
    else a decoder object with .decode(log_probs, output_lengths=...) ->
    per-utterance token-id lists (top-1) or lists of top-k lists when
    args.decoder_topk > 1 (host beam only). mesh: shard the DEVICE beams'
    batch dim over the mesh 'data' axis (transcribe --data-parallel)."""
    choice = getattr(args, 'decoder', 'GreedyDecoder')
    if choice in (None, '', 'GreedyDecoder'):
        return None
    if choice == 'BeamSearchDecoderDevice':
        # on-device vectorized beam; optional --lm = CHAR-bigram ARPA fused
        # on device (decode/beam.char_lm_table)
        from ..ops.beam_device import beam_search_device, beam_search_device_sharded
        device_lm_table = None
        if getattr(args, 'lm', None):
            from .beam import char_lm_table, load_lm
            device_lm_table = char_lm_table(load_lm(args.lm),
                                            vocab or tokenizer.vocab)

        class _DeviceBeam:
            topk = 1

            def decode(self, log_probs, output_lengths=None):
                import jax.numpy as jnp
                lengths = output_lengths if output_lengths is not None \
                    else [log_probs.shape[1]] * len(log_probs)
                beam_kw = dict(beam_width=args.beam_width,
                               cutoff_top_n=args.beam_cutoff_top_n,
                               max_len=int(log_probs.shape[1]) + 1,
                               lm_table=device_lm_table,
                               lm_alpha=args.beam_alpha,
                               lm_beta=args.beam_beta)
                if mesh is not None:
                    tokens, lens, _ = beam_search_device_sharded(
                        log_probs, jnp.asarray(lengths, jnp.int32),
                        tokenizer.eps_id, mesh, **beam_kw)
                else:
                    tokens, lens, _ = beam_search_device(
                        jnp.asarray(log_probs),
                        jnp.asarray(lengths, jnp.int32),
                        tokenizer.eps_id, **beam_kw)
                tokens, lens = np.asarray(tokens), np.asarray(lens)
                return [tokens[b, 0, :lens[b, 0]].tolist()
                        for b in range(len(tokens))]

        return _DeviceBeam()
    if choice == 'BeamSearchDecoderDeviceLM':
        # hybrid: on-device top-K beam, then host WORD-LM rescoring of the K
        # complete hypotheses (decode/beam.decode_device_with_lm). Rescoring
        # finished hypotheses avoids in-beam pruning of LM-favored prefixes —
        # on the confusable probe corpus it beats even the host per-frame
        # fusion (WER 0.017 vs 0.050; COMPONENTS.md row 9). Use small
        # --beam-width (e.g. 16): K is the device beam's width.
        from .beam import decode_device_with_lm

        class _HybridBeam:
            topk = 1

            def decode(self, log_probs, output_lengths=None):
                return decode_device_with_lm(
                    log_probs, output_lengths, tokenizer,
                    lm_path=getattr(args, 'lm', None),
                    alpha=args.beam_alpha, beta=args.beam_beta,
                    beam_width=args.beam_width,
                    cutoff_top_n=args.beam_cutoff_top_n,
                    max_len=getattr(args, 'beam_max_len', None) or None,
                    mesh=mesh)

        return _HybridBeam()
    if choice == 'BeamSearchDecoder':
        # --beam-rescore: acoustic-only beam + word-LM rescoring of the top
        # complete hypotheses instead of per-frame in-beam fusion — measured
        # equal to the device hybrid's WER (0.067 vs fusion 0.108 vs greedy
        # 0.175 on the formant confusable probe) at host-beam speed, and
        # streaming finals inherit it (serve/streaming.py decode_one)
        from .beam import BeamSearchDecoder
        return BeamSearchDecoder(
            tokenizer, lm_path=getattr(args, 'lm', None),
            beam_width=args.beam_width, beam_alpha=args.beam_alpha,
            beam_beta=args.beam_beta,
            cutoff_top_n=getattr(args, 'beam_cutoff_top_n', None) or 40,
            topk=getattr(args, 'decoder_topk', 1),
            rescore=getattr(args, 'beam_rescore', False))
    raise ValueError(f'unknown decoder {choice!r}')
