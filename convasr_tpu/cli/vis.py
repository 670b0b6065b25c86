"""Visualization CLI: transcript / errors / logits / tabulate / summary / label.

Behavior spec: /root/reference/vis.py:810-872 argparse — subcommands over the
report builders in convasr_tpu.vis.report plus experiment-dir tabulation
(vis.py:688-718) and a minimal labeling page (vis.py:204-271).
"""
import argparse
import collections
import glob
import json
import math
import os

import numpy as np

from ..data import transcripts
from ..vis import report


def cmd_transcript(transcript_path, sample_rate, mono, output_path):
    html_path = output_path or (transcript_path + '.html')
    print(report.transcript(html_path, sample_rate, mono, transcript_path))


def cmd_errors(input_paths, output_path):
    runs = {}
    for path in input_paths:
        with open(path) as f:
            runs[os.path.basename(path)] = json.load(f)
    print(report.errors(output_path or 'errors.html', runs))


def cmd_logits(logits_path, output_path):
    data = np.load(logits_path, allow_pickle=True)
    entries = [dict(audio_path=str(data.get('audio_path', '')),
                    logits=data[k], ref=str(data.get('ref', '')),
                    hyp=str(data.get('hyp', '')))
               for k in data.files if k.startswith('logits_')]
    print(report.logits(output_path or (logits_path + '.html'), entries))


def cmd_tabulate(experiments_dir, experiment_id, metric_name, labels_name, json_):
    """Metric-vs-iteration table from per-eval transcripts jsons (spec:
    vis.py:688-718)."""
    res = collections.defaultdict(list)
    experiment_dir = os.path.join(experiments_dir, experiment_id)
    for f in sorted(glob.glob(os.path.join(experiment_dir, 'transcripts_*.json'))):
        eidx = f.find('epoch')
        if eidx < 0:
            continue
        iteration = f[eidx:].replace('.json', '').split('_')[1]
        name = f[f.find('transcripts_') + len('transcripts_'):eidx].rstrip('_')
        with open(f) as fh:
            rows = json.load(fh)
        vals = [r[metric_name] for r in rows
                if (not labels_name or r.get('labels_name') == labels_name)
                and isinstance(r.get(metric_name), (int, float))
                and math.isfinite(r[metric_name])]
        res[iteration].append((name, sum(vals) / len(vals) if vals else 0.0, f))
    names = sorted({n for rs in res.values() for n, _, _ in rs})
    print('iteration\t' + '\t'.join(names))
    for iteration, rs in sorted(res.items()):
        vals = {n: f'{v:.04f}' for n, v, _ in rs}
        print(f'{iteration}\t' + '\t'.join(vals.get(n, '') for n in names))


def cmd_summary(input_path):
    with open(input_path) as f:
        transcript = json.load(f)
    cers = [t['cer'] for t in transcript if isinstance(t.get('cer'), (int, float))]
    durations = [transcripts.compute_duration(t) for t in transcript
                 if 'begin' in t or 'end' in t]
    print(f'{input_path}: {len(transcript)} utt | '
          f'{sum(durations) / 3600:.1f} h | '
          f'cer {sum(cers) / len(cers):.2%}' if cers else f'{input_path}: no cer')


def cmd_label(input_path, output_path):
    """Minimal labeling UI: editable 'after' field per utterance, exported as
    json via a download link (spec intent: vis.py:204-271)."""
    with open(input_path) as f:
        transcript = json.load(f)
    rows = '\n'.join(
        f'<tr><td>{t.get("audio_name", t.get("audio_path", ""))}</td>'
        f'<td>{t.get("ref", "")}</td>'
        f'<td contenteditable="true" class="after">{t.get("before", t.get("hyp", ""))}</td></tr>'
        for t in transcript)
    script = '''
function save() {
  const rows = [...document.querySelectorAll('tr')].slice(1).map(tr => ({
    audio_name: tr.cells[0].innerText, ref: tr.cells[1].innerText,
    after: tr.cells[2].innerText }));
  const a = document.createElement('a');
  a.href = URL.createObjectURL(new Blob([JSON.stringify(rows, null, 2)]));
  a.download = 'labeled.json'; a.click();
}'''
    html_path = output_path or (input_path + '.label.html')
    with open(html_path, 'w') as f:
        f.write('<html><head><meta charset="utf-8"><style>td {border: 1px solid #ccc;'
                'padding: 4px;} .after {background: #ffe;}</style></head><body>'
                f'<button onclick="save()">download labels</button><script>{script}'
                '</script><table><tr><th>audio</th><th>ref</th><th>label</th></tr>'
                + rows + '</table></body></html>')
    print(html_path)


def cmd_diarization(input_path, output_path, debug_audio, sample_rate):
    """Diarization HTML report (spec: vis.py:123-144)."""
    with open(input_path) as f:
        diarization_transcript = json.load(f)
    print(report.diarization(diarization_transcript,
                             output_path or (input_path + '.html'),
                             debug_audio=debug_audio, sample_rate=sample_rate))


def cmd_audiosample(input_path, output_path, k, dataset_root, sample_rate):
    """K random playable samples per group (spec: vis.py:612-639)."""
    print(report.audiosample(input_path, output_path or (input_path + '.sample.html'),
                             k, dataset_root=dataset_root, sample_rate=sample_rate))


def cmd_words(train_data_path, val_data_path):
    """Val words under-represented in train (spec: vis.py:721-729)."""
    for w, val_count, train_count in report.words(train_data_path, val_data_path):
        print(w, val_count, train_count)


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest='cmd', required=True)

    c = sub.add_parser('transcript')
    c.add_argument('transcript_path')
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--mono', action='store_true')
    c.add_argument('--output-path', '-o')
    c.set_defaults(func=cmd_transcript)

    c = sub.add_parser('errors')
    c.add_argument('input_paths', nargs='+')
    c.add_argument('--output-path', '-o')
    c.set_defaults(func=cmd_errors)

    c = sub.add_parser('logits')
    c.add_argument('logits_path')
    c.add_argument('--output-path', '-o')
    c.set_defaults(func=cmd_logits)

    c = sub.add_parser('tabulate')
    c.add_argument('--experiments-dir', default='data/experiments')
    c.add_argument('--experiment-id', required=True)
    c.add_argument('--metric-name', default='cer')
    c.add_argument('--labels-name', default='')
    c.add_argument('--json', dest='json_', action='store_true')
    c.set_defaults(func=cmd_tabulate)

    c = sub.add_parser('summary')
    c.add_argument('input_path')
    c.set_defaults(func=cmd_summary)

    c = sub.add_parser('diarization')
    c.add_argument('input_path')
    c.add_argument('--output-path', '-o')
    c.add_argument('--debug-audio', action='store_true')
    c.add_argument('--sample-rate', type=int, default=8000)
    c.set_defaults(func=cmd_diarization)

    c = sub.add_parser('audiosample')
    c.add_argument('input_path')
    c.add_argument('--output-path', '-o')
    c.add_argument('-K', dest='k', type=int, default=10)
    c.add_argument('--dataset-root', default='')
    c.add_argument('--sample-rate', type=int, default=8000)
    c.set_defaults(func=cmd_audiosample)

    c = sub.add_parser('words')
    c.add_argument('train_data_path')
    c.add_argument('val_data_path')
    c.set_defaults(func=cmd_words)

    c = sub.add_parser('label')
    c.add_argument('input_path')
    c.add_argument('--output-path', '-o')
    c.set_defaults(func=cmd_label)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
