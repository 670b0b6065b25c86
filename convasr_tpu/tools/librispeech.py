"""LibriSpeech transcript builder.

Spec context: the reference downloads LibriSpeech
(scripts/download_en_librispeech.sh) and consumes transcripts in its JSON
schema; this walks an extracted LibriSpeech split (.flac/.wav +
*.trans.txt) and emits that schema directly.
"""
import argparse
import glob
import json
import os


def build(input_path: str, output_path: str, ext: str = '.flac'):
    entries = []
    for trans_path in glob.glob(os.path.join(input_path, '**', '*.trans.txt'),
                                recursive=True):
        directory = os.path.dirname(trans_path)
        with open(trans_path) as f:
            for line in f:
                utt_id, _, text = line.strip().partition(' ')
                audio_path = os.path.join(directory, utt_id + ext)
                if not os.path.exists(audio_path):
                    continue
                entries.append(dict(audio_path=audio_path, ref=text.lower()))
    entries.sort(key=lambda t: t['audio_path'])
    with open(output_path, 'w') as f:
        json.dump(entries, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(output_path, '|', len(entries), 'utterances')
    return entries


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--input-path', '-i', required=True,
                        help='extracted LibriSpeech split dir (e.g. test-clean)')
    parser.add_argument('--output-path', '-o', required=True)
    parser.add_argument('--ext', default='.flac')
    args = parser.parse_args(argv)
    build(args.input_path, args.output_path, args.ext)


if __name__ == '__main__':
    main()
