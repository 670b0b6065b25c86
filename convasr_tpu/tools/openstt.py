"""ru_open_stt dataset split builder.

Behavior spec: /root/reference/datasets/openstt.py:1-139 — read the public
metadata CSV, apply exclude lists and per-group CER thresholds from the
benchmark CSV, group by corpus, and emit the clean/mixed/radio/calls splits
(train/val/small) as transcript JSON files.
"""
import argparse
import gzip
import itertools
import json
import os
import random

from ..data import transcripts


def gzopen(path, mode='rt'):
    return gzip.open(path, mode) if path.endswith('.gz') else open(path, mode)


def dump(by_split, output_dir, subset_name, gz=True):
    for split_name, transcript in by_split.items():
        path = os.path.join(output_dir, f'{subset_name}_{split_name}.json') + ('.gz' if gz else '')
        with (gzip.open(path, 'wt') if gz else open(path, 'w')) as f:
            json.dump(transcript, f, indent=2, sort_keys=True, ensure_ascii=False)
        hours = int(sum(transcripts.compute_duration(t, hours=True) for t in transcript))
        print(path, '|', int(os.path.getsize(path) // 1e6), 'Mb |',
              len(transcript) // 1000, 'K utt |', hours, 'hours')


def split(by_group, groups, spec, sample_keyword='sample'):
    """Deterministically split the concatenation of `groups` according to
    `spec` {split_name: count|fraction|None|(count, sample_count)}."""
    transcript = [t for g in groups for t in by_group.get(g, [])]
    random.seed(1)
    random.shuffle(transcript)

    def resolve(cnt, pool):
        if cnt is None:
            return len(pool)
        return cnt if isinstance(cnt, int) else int(len(pool) * cnt)

    k, res = 0, {}
    for split_name, cnt in spec.items():
        if isinstance(cnt, tuple):
            n = resolve(cnt[0], transcript)
            shuffled = transcript[k:k + n]
            random.shuffle(shuffled)
            res[split_name] = shuffled
            res[f'{split_name}_{sample_keyword}'] = shuffled[:resolve(cnt[1], shuffled)]
            cnt = n
        else:
            cnt = resolve(cnt, transcript)
            res[split_name] = transcript[k:k + cnt]
        k += cnt
    return res


def build_splits(metadata, exclude_files, benchmark, max_cer, output_dir,
                 gz=False, min_kb=20):
    is_header = lambda i, l: i == 0 or ',' not in l or l[0] == ','

    transcript = []
    with gzopen(metadata) as f:
        for i, line in enumerate(f):
            if is_header(i, line):
                continue
            s = line.strip().split(',')
            transcript.append(dict(
                audio_path=s[-1], audio_name=os.path.basename(s[-1]), group=s[2],
                begin=0.0, end=float(s[3]), ref=s[-3], file_size_kb=float(s[5])))

    exclude = set()
    for path in exclude_files:
        with gzopen(path) as f:
            for i, line in enumerate(f):
                if not is_header(i, line):
                    exclude.add(os.path.basename(line.split(',')[1]))

    filtered_by_cer = set()
    with gzopen(benchmark) as f:
        for i, line in enumerate(f):
            if is_header(i, line):
                continue
            s = line.strip().split(',')
            audio_path, group, cer = s[1], s[-1], float(s[-3])
            if cer <= max_cer[group]:
                filtered_by_cer.add(os.path.basename(audio_path))

    transcript = [t for t in transcript
                  if t.pop('file_size_kb') >= min_kb and t['audio_name'] not in exclude
                  and ('_val' in t['group'] or t['audio_name'] in filtered_by_cer)]

    by_group = {k: list(g) for k, g in itertools.groupby(
        sorted(transcript, key=lambda t: t['group']), key=lambda t: t['group'])}

    clean = split(by_group,
                  ['voxforge_ru', 'ru_RU', 'russian_single', 'public_lecture_1',
                   'public_series_1'],
                  dict(train=0.95, val=0.05))
    mixed_val = split(by_group, ['buriy_audiobooks_2_val', 'public_youtube700_val'],
                      dict(val=None))
    mixed = split(by_group,
                  ['private_buriy_audiobooks_2', 'public_youtube700',
                   'public_youtube1120', 'public_youtube1120_hq', 'radio_2'],
                  dict(train=None))
    mixed['train'] += clean['train']
    random.seed(1)
    random.shuffle(mixed['train'])
    mixed['val'] = mixed_val['val']
    mixed['small'] = mixed['train'][:int(0.1 * len(mixed['train']))]
    radio = split(by_group, ['radio_2'], dict(train=0.9, val=0.1))

    os.makedirs(output_dir, exist_ok=True)
    dump(radio, output_dir, 'radio', gz=gz)
    dump(clean, output_dir, 'clean', gz=gz)
    dump(mixed, output_dir, 'mixed', gz=gz)
    dump(split(by_group, ['asr_calls_2_val'], dict(val=None)), output_dir, 'calls', gz=gz)
    return by_group


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--metadata', default='public_meta_data_v04_fx.csv.gz')
    parser.add_argument('--exclude', nargs='*',
                        default=['public_exclude_file_v5.csv.gz',
                                 'exclude_df_youtube_1120.csv.gz'])
    parser.add_argument('--benchmark', default='benchmark_v05_public.csv.gz')
    parser.add_argument('--output-dir', '-o', default='splits')
    parser.add_argument('--gzip', action='store_true')
    parser.add_argument('--min-kb', type=int, default=20)
    parser.add_argument('--max-cer', default='clean_thresholds_cer.json')
    args = parser.parse_args(argv)
    with open(args.max_cer) as f:
        max_cer = json.load(f)
    build_splits(args.metadata, args.exclude, args.benchmark, max_cer,
                 args.output_dir, gz=args.gzip, min_kb=args.min_kb)


if __name__ == '__main__':
    main()
