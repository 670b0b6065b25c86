"""YouTube subtitle-transcript dataset builder.

Behavior spec: /root/reference/datasets/youtube.py — collect per-video info
JSONs (produced by a yt-dlp scrape, datasets/youtube.sh), filter by duration/
transcript size, strip the speaker-phrase separator from refs, and emit a
combined transcript JSON optionally split into parts.
"""
import argparse
import glob
import json
import os

SPEAKER_PHRASE_SEPARATOR = ';'


def clean_ref(ref: str) -> str:
    # a ';' inside a ref would break speaker-aligned encoding
    # (datasets.py:344-346)
    return ref.replace(SPEAKER_PHRASE_SEPARATOR, '')


def build(input_path, output_path, split_by_parts=2,
          skip_files_longer_than_hours=float('inf'),
          skip_transcript_large_than_char=float('inf'),
          skip_transcript_after_seconds=float('inf'), strip=()):
    collected = []
    for i, info_path in enumerate(glob.glob(os.path.join(input_path, '*.json'))):
        try:
            with open(info_path) as f:
                info = json.load(f)
            if info.get('duration', 0) / 3600.0 >= skip_files_longer_than_hours:
                continue
            total_ref_len = sum(len(t.get('ref', '')) for t in info.get('transcript', []))
            if total_ref_len > skip_transcript_large_than_char:
                continue
            entries = [dict(audio_path=info_path.replace('.json', ''), speaker_name='',
                            **{k: v for k, v in t.items() if k not in strip})
                       for t in info.get('transcript', [])]
            collected.extend(t for t in entries
                             if t['end'] <= skip_transcript_after_seconds)
        except Exception as e:
            print(info_path, e)
    for t in collected:
        t['ref'] = clean_ref(t['ref'])

    with open(output_path, 'w') as f:
        json.dump(collected, f, ensure_ascii=False, indent=2, sort_keys=True)
    if split_by_parts:
        step = len(collected) // split_by_parts + 1
        for i in range(split_by_parts):
            with open(output_path.replace('.json', '') + f'{i}.json', 'w') as f:
                json.dump(collected[i * step:(i + 1) * step], f, ensure_ascii=False,
                          indent=2, sort_keys=True)
    print(output_path)
    return collected


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--input-path', '-i', required=True)
    parser.add_argument('--output-path', '-o', required=True)
    parser.add_argument('--split-by-parts', type=int, default=2)
    parser.add_argument('--skip-files-longer-than-hours', type=float, default=float('inf'))
    parser.add_argument('--skip-transcript-large-than-char', type=float, default=float('inf'))
    parser.add_argument('--skip-transcript-after-seconds', type=float, default=float('inf'))
    parser.add_argument('--strip', nargs='*', default=[])
    args = parser.parse_args(argv)
    build(**vars(args))


if __name__ == '__main__':
    main()
