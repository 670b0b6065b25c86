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


def cmd_transcript(transcript_path, sample_rate, mono, output_path,
                   transcript_path_opt=None):
    transcript_path = transcript_path or transcript_path_opt
    assert transcript_path, 'pass the transcript json (positional or --transcript)'
    html_path = output_path or (transcript_path + '.html')
    print(report.transcript(html_path, sample_rate, mono, transcript_path))


def cmd_errors(input_paths, output_path, include, exclude, debug_audio,
               sort_key, descending, include_metrics, metric_filters, duration,
               input_paths_opt=None):
    input_paths = input_paths or input_paths_opt or []
    assert input_paths, 'pass analyzed jsons (positional or --input-path)'
    """Multi-run error table with include/exclude/metric-interval filters and
    multi-key sorting (spec: vis.py:763-804 cmd_errors)."""
    from ..metrics import extract_metric_value
    assert duration is None or len(duration) == 2, 'Wrong duration format'
    assert len(metric_filters) % 3 == 0, 'Wrong metric filters format'
    allowed_intervals = {}
    for i in range(0, len(metric_filters), 3):
        metric_name, lower, higher = metric_filters[i:i + 3]
        assert metric_name in include_metrics, \
            f'Wrong metric filter {metric_name} not in metrics list {include_metrics}'
        allowed_intervals[metric_name] = (float(lower), float(higher))
    for key in sort_key:
        assert key in include_metrics, \
            f'Sorting key {key} not in metrics list {include_metrics}'
    include, exclude = set(include), set(exclude)

    def filter_fn(examples):
        for example in examples:
            if example.get('audio_path') in exclude:
                return False
            if include and example.get('audio_path') not in include:
                return False
            if duration is not None and 'duration' in example and not (
                    duration[0] <= example['duration'] < duration[1]):
                return False
            for metric_name, (lower, higher) in allowed_intervals.items():
                v = extract_metric_value(example, metric_name)
                if v is None or not (lower <= v * 100 < higher):
                    return False
        return True

    def sort_fn(grouped):
        if not sort_key:
            return grouped
        missing = float('-inf') if descending else float('inf')
        key_fn = lambda tup: tuple(
            extract_metric_value(tup[0], key, missing=missing) for key in sort_key)
        return sorted(grouped, key=key_fn, reverse=descending)

    runs = {}
    for path in input_paths:
        with open(path) as f:
            runs[os.path.basename(path)] = json.load(f)
    print(report.errors(output_path or 'errors.html', runs,
                        debug_audio=debug_audio, include_metrics=include_metrics,
                        filter_fn=filter_fn, sort_fn=sort_fn))


def cmd_logits(logits_path, output_path, audio_name, lang='ru'):
    data = np.load(logits_path, allow_pickle=True)
    entries = [dict(audio_path=str(data.get('audio_path', '')),
                    logits=data[k], ref=str(data.get('ref', '')),
                    hyp=str(data.get('hyp', '')))
               for k in data.files if k.startswith('logits_')]
    if audio_name:
        wanted = set(audio_name)
        entries = [e for e in entries
                   if os.path.basename(e.get('audio_path', '')) in wanted
                   or e.get('audio_path', '') in wanted]
    print(report.logits(output_path or (logits_path + '.html'), entries))


def cmd_tabulate(experiments_dir, experiment_id, metric_name, labels_name, json_,
                 show_ratio_below=None):
    """Metric-vs-iteration table from per-eval transcripts jsons (spec:
    vis.py:688-718). With --show-ratio-below X, each cell is the fraction of
    examples whose metric is below X instead of the mean (vis.py:842)."""
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
        if show_ratio_below is not None:
            agg = (sum(v < show_ratio_below for v in vals) / len(vals)
                   if vals else 0.0)
        else:
            agg = sum(vals) / len(vals) if vals else 0.0
        res[iteration].append((name, agg, f))
    names = sorted({n for rs in res.values() for n, _, _ in rs})
    if json_:
        print(json.dumps({it: {n: v for n, v, _ in rs}
                          for it, rs in sorted(res.items())}, indent=2))
        return
    print('iteration\t' + '\t'.join(names))
    for iteration, rs in sorted(res.items()):
        vals = {n: f'{v:.04f}' for n, v, _ in rs}
        print(f'{iteration}\t' + '\t'.join(vals.get(n, '') for n in names))


def cmd_summary(input_path, lang='ru'):
    with open(input_path) as f:
        transcript = json.load(f)
    cers = [t['cer'] for t in transcript if isinstance(t.get('cer'), (int, float))]
    durations = [transcripts.compute_duration(t) for t in transcript
                 if 'begin' in t or 'end' in t]
    print(f'{input_path}: {len(transcript)} utt | '
          f'{sum(durations) / 3600:.1f} h | '
          f'cer {sum(cers) / len(cers):.2%}' if cers else f'{input_path}: no cer')


def cmd_label(input_path, output_path, info=None, page_size=100, prefix='export'):
    """Labeling UI: editable 'after' field per utterance, exported as json via
    a download link (spec: vis.py:204-271). With --info, pages of `page_size`
    entries (matched to the transcript by audio_name) are written as
    `<output>.page{p}.html`, each with a per-page export named
    `{prefix}_page{p}_...json` like the reference; without --info the whole
    transcript becomes one page."""
    with open(input_path) as f:
        transcript = json.load(f)
    by_name = {transcripts.audio_name(t): t for t in transcript}
    if info is not None:
        with open(info) as f:
            entries = json.load(f)
    else:
        entries = [dict(audio_name=name, before=t.get('before', t.get('hyp', '')))
                   for name, t in by_name.items()]

    def page_html(page_entries, page, page_count):
        rows = '\n'.join(
            '<tr><td>{name}</td><td>{ref}</td>'
            '<td contenteditable="true" class="after" data-before="{before}">{before}</td></tr>'
            .format(name=e.get('audio_name', ''),
                    ref=by_name.get(e.get('audio_name', ''), {}).get('ref', ''),
                    before=e.get('after', '') or e.get('before', ''))
            for e in page_entries)
        script = ('''
function save() {
  const rows = [...document.querySelectorAll('tr')].slice(1).map(tr => ({
    audio_name: tr.cells[0].innerText, ref: tr.cells[1].innerText,
    before: tr.cells[2].dataset.before, after: tr.cells[2].innerText }));
  const a = document.createElement('a');
  a.href = URL.createObjectURL(new Blob([JSON.stringify(rows, null, 2)]));
  a.download = '%s_page%d_time' + Math.round(Date.now() / 1000) + '.json';
  a.click();
}''' % (prefix, page))
        return ('<html><head><meta charset="utf-8"><style>td {border: 1px solid #ccc;'
                'padding: 4px;} .after {background: #ffe;}</style></head><body>'
                f'<p>page {page}/{page_count}</p>'
                f'<button onclick="save()">download labels</button><script>{script}'
                '</script><table><tr><th>audio</th><th>ref</th><th>label</th></tr>'
                + rows + '</table></body></html>')

    base = output_path or (input_path + '.label')
    page_count = max(1, math.ceil(len(entries) / page_size))
    for p in range(page_count):
        html_path = (f'{base}.page{p}.html' if info is not None
                     else (output_path or (input_path + '.label.html')))
        with open(html_path, 'w') as f:
            f.write(page_html(entries[p * page_size:(p + 1) * page_size],
                              p, page_count))
        print(html_path)
        if info is None:
            break


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
    c.add_argument('transcript_path', nargs='?')
    c.add_argument('--transcript', '-i', dest='transcript_path_opt', default=None,
                   help='alias for the positional path (reference vis.py:819)')
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--mono', action='store_true')
    c.add_argument('--output-path', '-o', '--html-path', dest='output_path')
    c.set_defaults(func=cmd_transcript)

    c = sub.add_parser('errors')
    c.add_argument('input_paths', nargs='*')
    c.add_argument('--input-path', nargs='+', dest='input_paths_opt', default=None,
                   help='alias for the positional paths (reference vis.py:826)')
    c.add_argument('--output-path', '-o')
    c.add_argument('--include', nargs='*', default=[])
    c.add_argument('--exclude', nargs='*', default=[])
    c.add_argument('--audio', dest='debug_audio', action='store_true')
    c.add_argument('--sort-key', nargs='*', default=[])
    c.add_argument('--descending', action='store_true')
    c.add_argument('--metrics', nargs='+', default=['cer', 'wer'],
                   dest='include_metrics')
    c.add_argument('--metric-filters', nargs='*', default=[],
                   help='triples: $metric $lower $upper; keep lower <= 100*value < upper')
    c.add_argument('--duration', type=transcripts.number_tuple, default=None)
    c.set_defaults(func=cmd_errors)

    c = sub.add_parser('logits')
    c.add_argument('logits_path')
    c.add_argument('--output-path', '-o')
    c.add_argument('--audio-name', nargs='*', default=None)
    c.add_argument('--lang', default='ru')
    c.set_defaults(func=cmd_logits)

    c = sub.add_parser('tabulate')
    c.add_argument('--experiments-dir', default='data/experiments')
    c.add_argument('--experiment-id', required=True)
    c.add_argument('--metric-name', default='cer')
    c.add_argument('--labels-name', default='')
    c.add_argument('--json', dest='json_', action='store_true')
    c.add_argument('--show-ratio-below', type=float, default=None,
                   help='cell = fraction of examples with metric below this value')
    c.set_defaults(func=cmd_tabulate)

    c = sub.add_parser('summary')
    c.add_argument('input_path')
    c.add_argument('--lang', default='ru')
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
    c.add_argument('--info', default=None,
                   help='json of {audio_name, before[, after]} entries to label')
    c.add_argument('--page-size', type=int, default=100)
    c.add_argument('--prefix', default='export')
    c.set_defaults(func=cmd_label)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
