"""Dataset & experiment tooling CLI.

Behavior spec: /root/reference/tools.py:26-732 — subcommands: bpetrain,
subset, cut, cat, csv2json, du, diff, rmoldcheckpoints, transcode,
lserrorwords, wordtags, processcomments, split, filter_dataset,
cleanup_transcripts_with_empty_ref,
find_solution_for_frontend_input_output_shapes_divisibility.

Differences from the reference: bpetrain uses the in-repo BPE trainer
(convasr_tpu.text.train_bpe) instead of sentencepiece; rmoldcheckpoints
handles both orbax checkpoint directories and reference .pt files.
"""
import argparse
import collections
import functools
import hashlib
import itertools
import json
import math
import multiprocessing.pool
import os
import random
import re
import shutil
import subprocess

from ..audio import io as audio_io
from ..data import transcripts
from ..infra.utils import open_maybe_gz
from ..metrics.analyzer import PLACEHOLDER
from ..text import Stemmer, train_bpe


def bpetrain(input_path, output_prefix, vocab_size, model_type, max_sentencepiece_length):
    assert model_type == 'bpe', 'only bpe model type is supported by the in-repo trainer'
    with open(input_path) as f:
        sentences = [line.strip() for line in f if line.strip()]
    model_path = output_prefix + '.json'
    train_bpe(sentences, vocab_size=vocab_size, model_path=model_path)
    print(model_path)


def subset(input_path, output_path, allowed_audio_names, align_boundary_words,
           cer, wer, duration, gap, unk, num_speakers):
    cat_mode = output_path.endswith('.json')
    meta = dict(align_boundary_words=align_boundary_words, cer=cer, wer=wer,
                duration=duration, gap=gap, allowed_unk_count=unk,
                num_speakers=num_speakers)
    transcript_cat = []
    for name in os.listdir(input_path):
        if not name.endswith('.json'):
            continue
        with open(os.path.join(input_path, name)) as f:
            transcript = json.load(f)
        transcript = [dict(meta=meta, **t) for t in transcripts.prune(
            transcript, allowed_audio_names=allowed_audio_names, **meta)]
        transcript_cat.extend(transcript)
        if not cat_mode:
            os.makedirs(output_path, exist_ok=True)
            with open(os.path.join(output_path, name), 'w') as f:
                json.dump(transcript, f, ensure_ascii=False, sort_keys=True, indent=2)
    if cat_mode:
        with open(output_path, 'w') as f:
            json.dump(transcript_cat, f, ensure_ascii=False, sort_keys=True, indent=2)
    print(output_path)


def _cut_audio(output_path, sample_rate, mono, dilate, strip_prefix, audio_backend,
               add_sub_paths, audio_transcripts):
    out = []
    signal, prev_path = None, ''
    for t in audio_transcripts:
        audio_path = t['audio_path']
        if audio_path != prev_path:
            signal, _ = audio_io.read_audio(audio_path, sample_rate, backend=audio_backend)
        if signal.size == 0:
            print('Empty audio_path', audio_path)
            return []
        t['channel'] = 0 if len(signal) == 1 else None if mono else t.get('channel')
        channel_slice = slice(t['channel'], 1 + t['channel']) if t['channel'] is not None else slice(None)
        begin = int(max(t['begin'] - dilate, 0) * sample_rate)
        end = int((t['end'] + dilate) * sample_rate)
        segment = signal[channel_slice, begin:end]

        name = os.path.basename(audio_path) + '.{channel}-{begin:.06f}-{end:.06f}.wav'.format(**t)
        digest = hashlib.md5(name.encode('utf-8')).hexdigest()
        sub_path = [digest[-1:], digest[:2], name] if add_sub_paths else [name]
        segment_path = os.path.join(output_path, *sub_path)
        os.makedirs(os.path.dirname(segment_path), exist_ok=True)
        audio_io.write_audio(segment_path, segment, sample_rate, mono=True)

        if strip_prefix:
            segment_path = segment_path[len(strip_prefix):] \
                if segment_path.startswith(strip_prefix) else segment_path
            t['audio_path'] = t['audio_path'][len(strip_prefix):] \
                if t['audio_path'].startswith(strip_prefix) else t['audio_path']
        out.append(dict(
            audio_path=segment_path, audio_name=os.path.basename(segment_path),
            channel=0 if len(signal) == 1 else None, begin=0.0,
            end=segment.shape[-1] / sample_rate, speaker=t.pop('speaker', None),
            ref=t.pop('ref', None), hyp=t.pop('hyp', None), cer=t.pop('cer', None),
            wer=t.pop('wer', None), alignment=t.pop('alignment', []),
            words=t.pop('words', []), meta=t))
        prev_path = audio_path
    return out


def cut(input_path, output_path, sample_rate, mono, dilate, strip, strip_prefix,
        audio_backend, add_sub_paths, num_workers):
    os.makedirs(output_path, exist_ok=True)
    with open(input_path) as f:
        transcript = json.load(f)
    print('Segment count:', len(transcript))
    by_path: dict = {}
    for t in transcript:
        by_path.setdefault(t['audio_path'], []).append(t)
    print('Unique audio_path count:', len(by_path))

    map_func = functools.partial(_cut_audio, output_path, sample_rate, mono, dilate,
                                 strip_prefix, audio_backend, add_sub_paths)
    transcript_cat = []
    if num_workers > 0:
        with multiprocessing.pool.Pool(processes=num_workers) as pool:
            for ts in pool.imap_unordered(map_func, by_path.values()):
                transcript_cat.extend(ts)
    else:
        for ts in map(map_func, by_path.values()):
            transcript_cat.extend(ts)

    with open(os.path.join(output_path, os.path.basename(output_path) + '.json'), 'w') as f:
        json.dump(transcripts.strip(transcript_cat, strip), f, ensure_ascii=False,
                  sort_keys=True, indent=2)
    print(output_path)


def cat(input_path, output_path):
    paths = [p for p in input_path if p.endswith('.json')] + [
        os.path.join(d, n) for d in input_path if os.path.isdir(d)
        for n in os.listdir(d) if n.endswith('.json')]
    as_list = lambda o: [o] if isinstance(o, dict) else o
    transcript = sum((as_list(json.load(open(p))) for p in paths), [])
    with open(output_path, 'w') as f:
        json.dump(transcript, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path)


def du(input_path):
    with open(input_path) as f:
        transcript = json.load(f)
    print(input_path, int(os.path.getsize(input_path) // 1e6), 'Mb', '|',
          len(transcript) // 1000, 'K utt |',
          int(sum(transcripts.compute_duration(t) for t in transcript) / 3600), 'hours')


def csv2json(input_path, gz, group, reset_begin_end, csv_sep, audio_name_pattern=None,
             new_sub_path=None,
             debug_short_long_records_set_begin_end_from_name=False,
             debug_short_long_records_reset_audio_path=False,
             debug_short_long_records_clean_out_ref=False,
             debug_short_long_records_output_path=None):
    """Spec: tools.py:167-229 incl. the short/long-records debug switches
    (begin/end re-parsed from the file name, audio_path re-pointed under
    new_sub_path with short_records->long_records, refs blanked)."""
    regex = re.compile(audio_name_pattern) if audio_name_pattern else re.compile(
        r'(?P<begin>\d+\.?\d*)-(?P<end>\d+\.?\d*)_\d+\.?\d*_[01]_1\d{9}\.?\d*\.wav')
    sep = dict(tab='\t', comma=',')[csv_sep]

    def begin_end(audio_name):
        m = regex.fullmatch(audio_name)
        assert m is not None, f'{audio_name!r} must match {regex.pattern}'
        begin, end = float(m['begin']), float(m['end'])
        assert begin < end < 10_000, 'begin and end must be below 10_000 seconds'
        return begin, end

    res = []
    for line in open_maybe_gz(input_path):
        assert '"' not in line, 'csv lines must not contain quotation marks'
        audio_path, ref, begin, end = line.rstrip('\n').split(sep)[:4]
        t = dict(audio_path=audio_path, ref=ref, begin=float(begin), end=float(end))
        if reset_begin_end:
            b, e = begin_end(os.path.basename(audio_path))
            t['begin'], t['end'] = 0.0, e - b
        if debug_short_long_records_set_begin_end_from_name:
            t['begin'], t['end'] = begin_end(os.path.basename(audio_path))
        if debug_short_long_records_reset_audio_path:
            base_parts = os.path.basename(audio_path).split('_')
            channel_then_recordid = base_parts[-2] + '_' + base_parts[-1]
            t['old_audio_path'] = audio_path
            t['audio_path'] = os.path.join(
                new_sub_path if new_sub_path else os.path.dirname(audio_path),
                channel_then_recordid).replace('short_records', 'long_records')
        if debug_short_long_records_clean_out_ref:
            t['ref'] = ''
        if group >= 0:
            t['group'] = audio_path.split('/')[group]
        res.append(t)
    res.sort(key=lambda t: t['begin'])
    output_path = (debug_short_long_records_output_path or input_path) \
        + '.json' + ('.gz' if gz else '')
    with open_maybe_gz(output_path, 'wt') as f:
        json.dump(res, f, ensure_ascii=False, indent=2, sort_keys=False)
    print(output_path)


def diff(ours, theirs, key, output_path):
    t_ours = {t['audio_file_name']: t for t in json.load(open(ours))}
    t_theirs = {t['audio_file_name']: t for t in json.load(open(theirs))}
    d = sorted([dict(audio_name=name, diff=a[key] - b[key], ref=a['ref'],
                     hyp_ours=a['hyp'], hyp_thrs=b['hyp'])
                for name in t_ours for a, b in [(t_ours[name], t_theirs[name])]],
               key=lambda d: d['diff'], reverse=True)
    with open(output_path, 'w') as f:
        json.dump(d, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path)


def rmoldcheckpoints(experiments_dir, experiment_id, keepfirstperepoch, remove):
    assert keepfirstperepoch
    experiment_dir = os.path.join(experiments_dir, experiment_id)

    def parse(name):
        epoch = int(name.split('epoch')[1].split('_')[0])
        iteration = int(name.split('iter')[1].split('.')[0])
        return epoch, iteration, name

    ckpts = sorted(parse(n) for n in os.listdir(experiment_dir) if 'checkpoint_' in n)
    keep = [name for i, (epoch, _, name) in enumerate(ckpts)
            if i == 0 or epoch != ckpts[i - 1][0] or epoch == ckpts[-1][0]]
    rm = sorted(set(c[-1] for c in ckpts) - set(keep))
    print('\n'.join(rm))
    for name in (rm if remove else []):
        path = os.path.join(experiment_dir, name)
        shutil.rmtree(path, ignore_errors=True) if os.path.isdir(path) else os.remove(path)


def transcode(input_path, output_path, ext, cmd):
    with open(input_path) as f:
        transcript = json.load(f)
    os.makedirs(output_path, exist_ok=True)
    print(cmd)
    for t in transcript:
        out_audio = os.path.join(output_path, os.path.basename(t['audio_path'])) + (ext or '')
        with open(t['audio_path'], 'rb') as stdin, open(out_audio, 'wb') as stdout:
            subprocess.check_call(cmd, stdin=stdin, stdout=stdout, shell=True)
        t['audio_path'] = out_audio
    out_json = os.path.join(output_path, os.path.basename(output_path) + '.json')
    with open(out_json, 'w') as f:
        json.dump(transcript, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(out_json)


def lserrorwords(input_path, output_path, comment_path, freq_path, sortdesc, sortasc,
                 comment_filter, lang):
    freq = {s[0]: int(s[-1]) for line in open(freq_path)
            for s in [re.sub(r'[ ]+-[ ]*', '-', line).split()]} if freq_path else {}
    comment = {s[0]: s[-1].strip() for line in open(comment_path)
               for s in [line.split(',')] if '#' not in line and len(s) > 1} \
        if comment_path else {}
    with open(input_path) as f:
        transcript = json.load(f)
    transcript = [t for t in transcript
                  if [(w.get('type') or w.get('error_tag')) for w in t['words']]
                  .count('missing_ref') <= 2]
    stem = Stemmer(lang)
    strip_ph = lambda s: s.replace(PLACEHOLDER, '')
    words_ok = [strip_ph(w['ref']) for t in transcript for w in t['words']
                if (w.get('type') or w.get('error_tag')) == 'ok']
    words_error = set(r for t in transcript for w in t['words']
                      for r in [strip_ph(w['ref'])]
                      if (w.get('type') or w.get('error_tag')) not in ['ok', 'missing_ref']
                      and len(r) > 1)
    usage = {k: [u[1] for u in g] for k, g in itertools.groupby(
        sorted([(strip_ph(w['ref']), t) for t in transcript for w in t['words']],
               key=lambda u: u[0]), key=lambda u: u[0])}
    ok_counter = collections.Counter(map(stem, words_ok))
    err_counter = collections.Counter(map(stem, words_error))
    words = {ref: (ref, err_counter[l] - ok_counter[l], err_counter[l], ok_counter[l],
                   freq.get(ref, 0), usage.get(ref, [{}])[0].get('audio_name', ''),
                   usage.get(ref, [{}])[0].get('ref', ''), comment.get(ref, ''))
             for ref in words_error for l in [stem(ref)]}
    key = sortdesc or sortasc
    rows = sorted(words.values(),
                  key=lambda t: (t[1] if key == 'diff' else (-t[2] - t[3], t[5]), t[0]),
                  reverse=bool(sortdesc))
    rows = [t for t in rows if comment_filter in t[-1]]
    with open(output_path, 'w') as f:
        if output_path.endswith('.csv'):
            f.write('#word,diff,err,ok,freq,audioname,usage,comment\n'
                    + '\n'.join(','.join(map(str, t)) for t in rows))
        else:
            json.dump([dict(audio_name=t[5], before=t[0], after='') for t in rows], f,
                      ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path)


def wordtags(output_path, comment_path, map_tag, stop_tag):
    comment = {s[0]: s[-1].strip() for line in open(comment_path)
               for s in [line.split(',')]
               if '#' not in line and len(s) > 1 and s[-1].strip()} if comment_path else {}
    tags = {map_tag.get(k, k): [v[0] for v in g] for k, g in itertools.groupby(
        sorted(comment.items(), key=lambda t: t[1]), key=lambda t: t[1])}
    tags['stop'] = tags.get('stop', []) + stop_tag
    with open(output_path, 'w') as f:
        json.dump(tags, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path)


def processcomments(input_path, output_path, comment_path):
    with open(input_path) as f:
        transcript = json.load(f)
    comment = {s[0]: s[-1].strip() for line in open(comment_path)
               for s in [line.split(',')]
               if '#' not in line and len(s) > 1 and s[-1].strip()} if comment_path else {}
    exclude = {k for k, v in comment.items() if v in ('naw', 'comp', 'term', 'abbr')}
    normalize = lambda ref: ref.replace(PLACEHOLDER, '')
    print('Before filtering:', len(transcript))
    transcript = [t for t in transcript
                  if not any(normalize(w['ref']) in exclude for w in t['words'])]
    print('After filtering:', len(transcript))
    with open(output_path, 'w') as f:
        json.dump(transcript, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path)


def filter_dataset(input_path, output_path, duration_in_hours, cer, seed):
    dataset = transcripts.load(input_path)
    assert not cer or 0 <= cer < 1.0
    random.seed(seed)
    random.shuffle(dataset)
    total = lambda ds: sum(transcripts.compute_duration(t, hours=True) for t in ds)
    print('initial set hours:', total(dataset))
    if cer:
        dataset = [t for t in dataset if t['cer'] <= cer]
        print('after cer filtering hours:', total(dataset))
    if duration_in_hours is not None:
        kept, hours = [], 0.0
        while hours <= duration_in_hours and dataset:
            t = dataset.pop()
            hours += transcripts.compute_duration(t, hours=True)
            kept.append(t)
        dataset = kept
    print('after duration filtering hours:', total(dataset))
    transcripts.save(output_path, dataset)
    print(output_path)


def split(input_path, output_path, test_duration_in_hours, val_duration_in_hours,
          microval_duration_in_hours, old_microval_path, seed):
    with open(input_path) as f:
        train = json.load(f)
    random.seed(seed)
    random.shuffle(train)
    for t in train:
        t.pop('alignment', None)
        t.pop('words', None)
        t.get('meta', {}).pop('words_hyp', None)
        t.get('meta', {}).pop('words_ref', None)
    if old_microval_path:
        with open(os.path.join(output_path, old_microval_path)) as f:
            old_paths = {t['audio_path'] for t in json.load(f)}
        train = [t for t in train if t['audio_path'] not in old_paths]
    for set_name, duration in [('test', test_duration_in_hours),
                               ('val', val_duration_in_hours),
                               ('microval', microval_duration_in_hours)]:
        if duration is None:
            continue
        s, hours = [], 0.0
        while hours <= duration and train:
            t = train.pop()
            hours += transcripts.compute_duration(t, hours=True)
            s.append(t)
        with open(os.path.join(output_path,
                               os.path.basename(output_path) + f'_{set_name}.json'), 'w') as f:
            json.dump(s, f, ensure_ascii=False, sort_keys=True, indent=2)
    with open(os.path.join(output_path,
                           os.path.basename(output_path) + '_train.json'), 'w') as f:
        json.dump(train, f, ensure_ascii=False, sort_keys=True, indent=2)


def cleanup_transcripts_with_empty_ref(input_path, min_ref_length):
    with open(input_path) as f:
        transcript = json.load(f)
    filtered = [t for t in transcript if len(t.get('ref', '')) >= min_ref_length]
    output_path = os.path.join(os.path.dirname(input_path),
                               os.path.basename(input_path) + '_cleaned.json')
    with open(output_path, 'w') as f:
        json.dump(filtered, f, ensure_ascii=False, sort_keys=True, indent=2)
    print(output_path)


def find_solution_for_frontend_input_output_shapes_divisibility(
        window_size, window_stride, sample_rate, start, end,
        input_time_dim_multiple, output_time_dim_multiple):
    win_length = int(window_size * sample_rate)
    hop_length = int(window_stride * sample_rate)
    nfft = 2 ** math.ceil(math.log2(win_length))
    freq_cutoff = nfft // 2 + 1
    padding = freq_cutoff - 1
    for i in range(start * sample_rate, end * sample_rate):
        if i % input_time_dim_multiple:
            continue
        l_out = (i + 2 * padding - nfft) // hop_length + 1
        if l_out % output_time_dim_multiple == 0:
            print(f'Solution found: {i / sample_rate} sec, input {i}, '
                  f'frontend output {l_out}.')
    print('Finished!')


def lmtune(input_path, lm, beam_widths, alphas, betas, text_config, pipeline,
           cutoff_top_n, max_len, output_path, device):
    """Dev-tune the hybrid decoder's (alpha, beta) rescoring weights PER
    BEAM WIDTH (decode/beam.tune_rescore_weights; the r5 root cause of
    beam-width non-monotonicity — the word bonus beta must rise with K).

    Operator workflow:
      1. transcribe the DEV manifest with `--logits` (dense dumps; the
         `--logits-topk` sparse format is not accepted here) — one
         single-segment .npz per utterance with the logits of the head you
         will deploy (`--pipeline` at transcribe time) and the reference,
      2. `tools.py lmtune -i dev_out/ --lm word.binlm --beam-widths 16 32 64`
         with the SAME --pipeline,
      3. decode production with the printed flags for the beam width you
         deploy.
    """
    import glob

    import numpy as np

    from ..infra.utils import enable_compilation_cache, select_device
    select_device(device)
    enable_compilation_cache()

    from ..decode.beam import tune_rescore_weights
    from ..text import ProcessingPipeline

    files = (sorted(glob.glob(os.path.join(input_path, '*.npz')))
             if os.path.isdir(input_path) else [input_path])
    assert files, f'no .npz logits dumps under {input_path}'
    lps, refs = [], []
    for f in files:
        d = np.load(f, allow_pickle=True)
        keys = sorted(k for k in d.files if k.startswith('logits_')
                      and k[len('logits_'):].isdigit())
        assert keys == ['logits_0'], (
            f'{f}: expected exactly one dense logits_0 array, found {keys} — '
            'dump the dev set with `transcribe --logits` (no --logits-topk), '
            'one SINGLE-SEGMENT utterance per manifest entry (multi-segment '
            'dumps pair per-segment logits with the whole-file reference, '
            'which would tune against the wrong transcript)')
        x = d['logits_0']
        if x.dtype.kind == 'V' and x.dtype.itemsize == 2:
            # np.savez stores bf16 (ml_dtypes) as a 2-byte void dtype
            import ml_dtypes
            x = x.view(ml_dtypes.bfloat16)
        x = np.asarray(x, np.float32)
        m = x.max(-1, keepdims=True)
        lps.append(x - m - np.log(np.exp(x - m).sum(-1, keepdims=True)))
        ref = str(d['ref']).strip()
        assert ref, (
            f'{f}: empty reference — transcribe the dev set from a MANIFEST '
            'with refs (a plain audio dir dumps ref=""); tuning against '
            'empty refs would reward maximum deletions')
        refs.append(ref)
    T = max(lp.shape[0] for lp in lps)
    lp_pad = np.full((len(lps), T, lps[0].shape[-1]), -30.0, np.float32)
    olen = np.zeros(len(lps), np.int32)
    for i, lp in enumerate(lps):
        lp_pad[i, :lp.shape[0]] = lp
        olen[i] = lp.shape[0]

    pipe = ProcessingPipeline.make(
        ProcessingPipeline.load_config(text_config), pipeline)
    assert lp_pad.shape[-1] == pipe.tokenizer.vocab_size, (
        f'dumps have {lp_pad.shape[-1]} classes but pipeline {pipeline!r} '
        f'has vocab {pipe.tokenizer.vocab_size} — pass the --pipeline the '
        'dumps were transcribed with (a mismatched blank id would silently '
        'produce garbage tuning)')
    results = tune_rescore_weights(
        lp_pad, olen, refs, pipe.tokenizer,
        lambda toks: pipe.postprocess(pipe.decode([toks])[0]),
        lm, beam_widths=beam_widths, alphas=alphas, betas=betas,
        cutoff_top_n=cutoff_top_n, max_len=max_len)
    print(f'{len(files)} utts | {"K":>4s} {"(alpha, beta)":>14s} '
          f'{"devWER":>7s} {"evalWER":>8s} {"oracle":>7s}')
    for K, r in results.items():
        ab = f'({r["alpha"]}, {r["beta"]})'
        print(f'{"":9s} {K:4d} {ab:>14s} '
              f'{r["dev_wer"]:7.4f} {r["eval_wer"]:8.4f} {r["oracle_wer"]:7.4f}')
    # the deploy line must reproduce the TUNED beam configuration exactly
    extra = '' if cutoff_top_n == 8 else f' --beam-cutoff-top-n {cutoff_top_n}'
    extra += f' --beam-max-len {max_len}' if max_len else ''
    for K, r in results.items():
        print(f'K={K}: --decoder BeamSearchDecoderDeviceLM --beam-width {K} '
              f'--lm {lm} --beam-alpha {r["alpha"]} --beam-beta {r["beta"]}'
              f'{extra}')
    if output_path:
        with open(output_path, 'w') as f:
            json.dump({str(k): v for k, v in results.items()}, f, indent=2)
        print(output_path)
    return results


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest='cmd', required=True)

    c = sub.add_parser('lmtune', help='dev-tune hybrid-decoder (alpha, beta) '
                                      'per beam width from transcribe '
                                      '--logits dumps')
    c.add_argument('--input-path', '-i', required=True,
                   help='directory of transcribe --logits .npz dumps '
                        '(or one file)')
    c.add_argument('--lm', required=True, help='word .arpa/.arpa.gz/.binlm')
    c.add_argument('--beam-widths', type=int, nargs='+', default=[16, 32, 64])
    c.add_argument('--alphas', type=float, nargs='+',
                   default=[0.2, 0.3, 0.5, 0.7, 1.0, 1.5, 2.0])
    c.add_argument('--betas', type=float, nargs='+',
                   default=[0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 3.0])
    c.add_argument('--text-config', default='configs/ru_text_config.json')
    c.add_argument('--pipeline', default='char_legacy',
                   help='the pipeline the dumps were transcribed with')
    c.add_argument('--cutoff-top-n', type=int, default=8)
    c.add_argument('--max-len', type=int)
    c.add_argument('--output-path', '-o')
    c.add_argument('--device', default='',
                   help="e.g. 'cpu' to tune off-chip")
    c.set_defaults(func=lmtune)

    c = sub.add_parser('bpetrain')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-prefix', '-o', required=True)
    c.add_argument('--vocab-size', type=int, default=5000)
    c.add_argument('--model-type', default='bpe')
    c.add_argument('--max-sentencepiece-length', type=int)
    c.set_defaults(func=bpetrain)

    c = sub.add_parser('subset')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--allowed-audio-names')
    c.add_argument('--align-boundary-words', action='store_true')
    c.add_argument('--cer', type=transcripts.number_tuple)
    c.add_argument('--wer', type=transcripts.number_tuple)
    c.add_argument('--duration', type=transcripts.number_tuple)
    c.add_argument('--gap', type=transcripts.number_tuple)
    c.add_argument('--unk', type=transcripts.number_tuple)
    c.add_argument('--num-speakers', type=transcripts.number_tuple)
    c.set_defaults(func=subset)

    c = sub.add_parser('cut')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--mono', action='store_true')
    c.add_argument('--dilate', type=float, default=0.0)
    c.add_argument('--strip', nargs='*', default=[])
    c.add_argument('--strip-prefix', default='')
    c.add_argument('--audio-backend', default=None)
    c.add_argument('--add-sub-paths', action='store_true')
    c.add_argument('--num-workers', type=int, default=0)
    c.set_defaults(func=cut)

    c = sub.add_parser('cat')
    c.add_argument('--input-path', '-i', nargs='+', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.set_defaults(func=cat)

    c = sub.add_parser('csv2json')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--gz', '--gzip', action='store_true')
    c.add_argument('--group', type=int, default=-1)
    c.add_argument('--reset-begin-end', action='store_true')
    c.add_argument('--csv-sep', default='comma', choices=['comma', 'tab'])
    c.add_argument('--audio-name-pattern')
    c.add_argument('--new-sub-path')
    c.add_argument('--debug-short-long-records-set-begin-end-from-name',
                   action='store_true')
    c.add_argument('--debug-short-long-records-reset-audio-path',
                   action='store_true')
    c.add_argument('--debug-short-long-records-clean-out-ref', action='store_true')
    c.add_argument('--debug-short-long-records-output-path')
    c.set_defaults(func=csv2json)

    c = sub.add_parser('du')
    c.add_argument('--input-path', '-i', required=True)
    c.set_defaults(func=du)

    c = sub.add_parser('diff')
    c.add_argument('--ours', required=True)
    c.add_argument('--theirs', required=True)
    c.add_argument('--key', default='cer')
    c.add_argument('--output-path', '-o', required=True)
    c.set_defaults(func=diff)

    c = sub.add_parser('rmoldcheckpoints')
    c.add_argument('--experiments-dir', default='data/experiments')
    c.add_argument('--experiment-id', required=True)
    c.add_argument('--keepfirstperepoch', action='store_true')
    c.add_argument('--remove', action='store_true')
    c.set_defaults(func=rmoldcheckpoints)

    c = sub.add_parser('transcode')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--ext')
    c.add_argument('--cmd', default='sox - -t wav -')
    c.set_defaults(func=transcode)

    c = sub.add_parser('lserrorwords')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', default='data/error_words.csv')
    c.add_argument('--comment-path')
    c.add_argument('--freq-path')
    c.add_argument('--sortdesc')
    c.add_argument('--sortasc')
    c.add_argument('--comment-filter', default='')
    c.add_argument('--lang', default='ru')
    c.set_defaults(func=lserrorwords)

    c = sub.add_parser('wordtags')
    c.add_argument('--output-path', '-o', default='data/word_tags.json')
    c.add_argument('--comment-path')
    c.add_argument('--map-tag', type=json.loads, default={})
    c.add_argument('--stop-tag', nargs='*', default=[])
    c.set_defaults(func=wordtags)

    c = sub.add_parser('processcomments')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--comment-path')
    c.set_defaults(func=processcomments)

    c = sub.add_parser('filter_dataset')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--duration-in-hours', type=float)
    c.add_argument('--cer', type=float)
    c.add_argument('--seed', type=int, default=1)
    c.set_defaults(func=filter_dataset)

    c = sub.add_parser('split')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--test-duration-in-hours', type=float)
    c.add_argument('--val-duration-in-hours', type=float)
    c.add_argument('--microval-duration-in-hours', type=float)
    c.add_argument('--old-microval-path')
    c.add_argument('--seed', type=int, default=1)
    c.set_defaults(func=split)

    c = sub.add_parser('cleanup_transcripts_with_empty_ref')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--min-ref-length', type=int, default=1)
    c.set_defaults(func=cleanup_transcripts_with_empty_ref)

    c = sub.add_parser('find_solution_for_frontend_input_output_shapes_divisibility')
    c.add_argument('--window-size', type=float, default=0.02)
    c.add_argument('--window-stride', type=float, default=0.01)
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--start', type=int, required=True)
    c.add_argument('--end', type=int, required=True)
    c.add_argument('--input-time-dim-multiple', type=int, default=16)
    c.add_argument('--output-time-dim-multiple', type=int, default=32)
    c.set_defaults(func=find_solution_for_frontend_input_output_shapes_divisibility)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
