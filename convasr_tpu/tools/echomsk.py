"""Echo of Moscow podcast dataset sampler.

Behavior spec: /root/reference/datasets/echomsk.py — filter episodes by
speaker count / duration / single audio, sample N, write per-episode
transcript JSONs plus a download list.
"""
import argparse
import json
import os
import random

from ..infra.utils import open_maybe_gz


def build(input_path, output_path, min_speakers=2, max_speakers=2, min_seconds=1,
          max_seconds=3600, sample=10, seed=1):
    with open_maybe_gz(input_path) as f:
        episodes = json.load(f)
    episodes = [e for e in episodes
                if min_speakers <= len(e['speakers']) <= max_speakers
                and min_seconds <= e['sound_seconds'] <= max_seconds
                and len(e['sound']) == 1]
    random.seed(seed)
    random.shuffle(episodes)
    episodes = episodes[:sample]

    os.makedirs(output_path, exist_ok=True)
    for e in episodes:
        transcript = [dict(audio_path=os.path.join(output_path,
                                                   os.path.basename(e['sound'][0])),
                           ref=t['ref'], speaker=t['speaker'])
                      for t in e['transcript']]
        with open(transcript[0]['audio_path'] + '.json', 'w') as f:
            json.dump(transcript, f, ensure_ascii=False, indent=2, sort_keys=True)

    download_list = os.path.join(output_path, os.path.basename(output_path) + '.txt')
    with open(download_list, 'w') as f:
        f.write('\n'.join(e['sound'][0] for e in episodes))
    return episodes


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--input-path', '-i', required=True)
    parser.add_argument('--output-path', '-o', required=True)
    parser.add_argument('--min-speakers', type=int, default=2)
    parser.add_argument('--max-speakers', type=int, default=2)
    parser.add_argument('--min-seconds', type=float, default=1)
    parser.add_argument('--max-seconds', type=float, default=3600)
    parser.add_argument('--sample', type=int, default=10)
    parser.add_argument('--seed', type=int, default=1)
    args = parser.parse_args(argv)
    build(**vars(args))


if __name__ == '__main__':
    main()
