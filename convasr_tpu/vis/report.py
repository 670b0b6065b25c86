"""Self-contained HTML reports: playable transcripts, error tables, logit maps.

Behavior spec: /root/reference/vis.py — transcript view vis.py:274-341
(embedded audio data-URI, click-to-seek segments, speaker/channel coloring),
multi-run error comparison vis.py:454-609, cer histograms vis.py:641-685,
tabulate vis.py:688-718. This is a fresh, leaner implementation with the same
outputs: every report is ONE standalone .html file with no external assets.
"""
import base64
import io
import json
import typing

import numpy as np

from ..audio import io as audio_io
from ..data import transcripts

META_CHARSET = '<meta charset="utf-8">'

SPEAKER_COLORS = ['gray', 'violet', 'lightblue', 'lightgreen', 'salmon', 'khaki']
CHANNEL_COLORS = ['lightblue', 'lightgreen']

PLAY_SCRIPT = '''
function play(event, channel, begin, end) {
  event.preventDefault();
  const audio = document.getElementById('audio' + channel) || document.querySelector('audio');
  if (!audio) return false;
  audio.currentTime = begin;
  audio.dataset.end = end;
  audio.play();
  return false;
}
document.addEventListener('timeupdate', (e) => {
  const a = e.target;
  if (a.dataset.end && a.currentTime >= parseFloat(a.dataset.end)) a.pause();
}, true);
'''


def audio_data_uri(signal: np.ndarray, sample_rate: int) -> str:
    """Encode a mono float32 signal as a base64 WAV data URI."""
    import scipy.io.wavfile
    buf = io.BytesIO()
    scipy.io.wavfile.write(buf, sample_rate, audio_io.f2s(np.atleast_2d(signal).T))
    return 'data:audio/wav;base64,' + base64.b64encode(buf.getvalue()).decode()


def _style():
    speaker_css = ' '.join(f'.speaker{i} {{background-color: {c};}}'
                           for i, c in enumerate(SPEAKER_COLORS))
    channel_css = ' '.join(f'.channel{i} {{background-color: {c};}}'
                           for i, c in enumerate(CHANNEL_COLORS))
    return (speaker_css + channel_css +
            ' a {text-decoration: none;} .reference {opacity: 0.4;}'
            ' .ok {background-color: #cfc;} td {vertical-align: top;}'
            ' table {border-collapse: collapse; width: 100%;}'
            ' td, th {border: 1px solid #ddd; padding: 3px;}')


def transcript(html_path: str, sample_rate: int, mono: bool, transcript,
               filtered_transcript=(), duration=None, NA='N/A') -> str:
    """Playable transcript report: audio player + click-to-seek segment table."""
    if isinstance(transcript, str):
        with open(transcript) as f:
            transcript = json.load(f)
    audio_path = transcript[0]['audio_path']
    audio_name = transcripts.audio_name(audio_path)

    try:
        signal, sample_rate = audio_io.read_audio(audio_path, sample_rate=sample_rate,
                                                  mono=mono, duration=duration)
        players = ''.join(
            f'<figure><figcaption>channel #{c}:</figcaption>'
            f'<audio id="audio{c}" style="width:100%" controls '
            f'src="{audio_data_uri(signal[c], sample_rate)}"></audio></figure>'
            for c in range(len(signal)))
    except Exception:
        players = '<p>(audio unavailable)</p>'

    filtered_ids = set(map(id, filtered_transcript))

    def row(i, t):
        ok = 'ok' if id(t) in filtered_ids else ''
        speaker = t.get('speaker', transcripts.speaker_missing)
        speaker = speaker if isinstance(speaker, int) else transcripts.speaker_missing
        channel = t.get('channel', transcripts.channel_missing)
        begin, end = t.get('begin', 0.0), t.get('end', 0.0)
        cer = t.get('cer', transcripts._er_missing)
        cer_str = f'{cer:.2%}' if cer != transcripts._er_missing else NA
        link = (f'<a href="#" onclick="return play(event, {max(channel, 0)}, '
                f'{begin}, {end})">{begin:.2f}&ndash;{end:.2f}</a>')
        return (f'<tr class="channel{max(channel, 0)} speaker{max(speaker, 0) % len(SPEAKER_COLORS)}">'
                f'<td class="{ok}">#{i}</td>'
                f'<td>{t.get("speaker_name") or speaker}</td><td>{link}</td>'
                f'<td style="width:45%">{t.get("hyp", "")}</td>'
                f'<td class="reference" style="width:45%">{t.get("ref", "")}</td>'
                f'<td>{cer_str}</td></tr>')

    rows = '\n'.join(row(i, t) for i, t in enumerate(transcripts.sort(transcript)))
    barcode = fmt_svg_speaker_barcode(transcript)  # speaker strip (vis.py:147-189)
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}<style>{_style()}</style></head><body>'
                f'<script>{PLAY_SCRIPT}</script>'
                f'<h4>{audio_name}</h4>{players}{barcode}<hr/>'
                f'<table><tr><th>#</th><th>speaker</th><th>time</th>'
                f'<th>hyp</th><th>ref</th><th>cer</th></tr>{rows}</table>'
                f'</body></html>')
    return html_path


def logits(html_path: str, logit_entries: typing.List[dict], vocab=None) -> str:
    """Per-utterance logit/entropy heatmaps (spec: vis.py:344-451). Each entry:
    dict(audio_path, logits (C, T) or (T, C), ref, hyp)."""
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except ImportError:
        raise RuntimeError('matplotlib required for logits visualization')

    sections = []
    for entry in logit_entries:
        arr = np.asarray(entry['logits'], dtype=np.float32)
        if arr.shape[0] > arr.shape[-1]:
            arr = arr.T  # -> (C, T)
        log_probs = arr - np.logaddexp.reduce(arr, axis=0, keepdims=True)
        entropy = -(np.exp(log_probs) * log_probs).sum(0)
        fig, axes = plt.subplots(2, 1, figsize=(12, 4),
                                 gridspec_kw=dict(height_ratios=[3, 1]), sharex=True)
        axes[0].imshow(log_probs, aspect='auto', origin='lower', cmap='viridis')
        axes[0].set_ylabel('class')
        axes[1].plot(entropy)
        axes[1].set_ylabel('entropy')
        buf = io.BytesIO()
        fig.savefig(buf, format='png', dpi=72, bbox_inches='tight')
        plt.close(fig)
        img = base64.b64encode(buf.getvalue()).decode()
        sections.append(
            f'<h4>{entry.get("audio_path", "")}</h4>'
            f'<p>ref: {entry.get("ref", "")}<br/>hyp: {entry.get("hyp", "")}</p>'
            f'<img src="data:image/png;base64,{img}"/>')
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}</head><body>' + '\n'.join(sections)
                + '</body></html>')
    return html_path


def errors(html_path: str, runs: typing.Dict[str, typing.List[dict]],
           strip_audio_path_prefix: str = '', debug_audio: bool = False,
           sample_rate: int = 8000,
           include_metrics: typing.Sequence[str] = ('cer',),
           filter_fn: typing.Optional[typing.Callable] = None,
           sort_fn: typing.Optional[typing.Callable] = None) -> str:
    """Multi-run error comparison table (spec: vis.py:454-609). `runs` maps
    run-name -> list of analyzed dicts (hyp/ref/cer per utterance).
    debug_audio embeds a playable <audio> per utterance (vis.py:317 flag).
    include_metrics selects per-run metric columns (dotted keys allowed);
    filter_fn/sort_fn operate on tuples of per-run entries grouped by example
    (vis.py:459-485 semantics); dropped counts are reported in the header."""
    import os
    from ..metrics import extract_metric_value

    def audio_cell(audio_path):
        if not (debug_audio and audio_path and os.path.exists(audio_path)):
            return ''
        try:
            signal, sr = audio_io.read_audio(audio_path, sample_rate=sample_rate,
                                             mono=True)
            return (f'<td><audio controls preload="none" '
                    f'src="{audio_data_uri(signal[0], sr)}"></audio></td>')
        except Exception:
            return '<td>(audio unavailable)</td>'

    names = list(runs)
    by_example: typing.Dict[str, dict] = {}
    for name in names:
        for t in runs[name]:
            key = t.get('audio_path', '') + '|' + t.get('ref', '')
            by_example.setdefault(key, {})[name] = t

    grouped = list(by_example.values())
    total = len(grouped)
    # examples absent from some run are dropped like vis.py:481 does
    grouped = [g for g in grouped if len(g) == len(names)]
    not_found = total - len(grouped)
    if filter_fn is not None:
        kept = [g for g in grouped
                if filter_fn(tuple(g[name] for name in names))]
        filtered = len(grouped) - len(kept)
        grouped = kept
    else:
        filtered = 0
    if sort_fn is not None:
        order = sort_fn([tuple(g[name] for name in names) for g in grouped])
        grouped = [dict(zip(names, tup)) for tup in order]

    def metric_cells(t):
        cells = []
        for m in include_metrics:
            v = extract_metric_value(t, m) if t else None
            cells.append(f'<td>{v:.2%}</td>' if isinstance(v, (int, float))
                         and v != transcripts._er_missing else '<td>N/A</td>')
        return cells

    header = ('<tr>' + ('<th>audio</th>' if debug_audio else '') + '<th>ref</th>'
              + ''.join(f'<th>{name} hyp</th>'
                        + ''.join(f'<th>{m}</th>' for m in include_metrics)
                        for name in names)
              + '</tr>')
    rows = []
    for entries in grouped:
        any_entry = next(iter(entries.values()))
        cells = ([audio_cell(any_entry.get('audio_path'))] if debug_audio else []) \
            + [f'<td class="reference">{any_entry.get("ref", "")}</td>']
        for name in names:
            t = entries.get(name, {})
            # detailed analyses carry a word alignment: render the color-coded
            # hyp (spec: fmt_alignment in error tables, vis.py:738-755)
            hyp_html = (fmt_alignment(t['alignment'], hyp=True, tag='<div>')
                        if t.get('alignment') else t.get('hyp', ''))
            cells.append(f'<td>{hyp_html}</td>')
            cells.extend(metric_cells(t))
        rows.append('<tr>' + ''.join(cells) + '</tr>')
    dropped = (f'<p>Dropped: {not_found} (not in all runs), '
               f'{filtered} (filters)</p>' if (not_found or filtered) else '')
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}<style>{_style()}</style></head><body>'
                f'{dropped}<table>{header}' + '\n'.join(rows)
                + '</table></body></html>')
    return html_path


def histc_vega(vals, min_val=0.0, max_val=1.0, bins=20) -> dict:
    """Histogram as a vega-lite spec dict (spec: vis.py:641-685)."""
    hist, edges = np.histogram(np.clip(np.asarray(vals, np.float64), min_val, max_val),
                               bins=bins, range=(min_val, max_val))
    return dict(
        **{'$schema': 'https://vega.github.io/schema/vega-lite/v4.json'},
        data=dict(values=[dict(x=float(edges[i]), y=int(hist[i])) for i in range(bins)]),
        mark='bar',
        encoding=dict(x=dict(field='x', type='quantitative'),
                      y=dict(field='y', type='quantitative')))


def fmt_svg_speaker_barcode(transcript, begin: float = None, end: float = None,
                            colors=SPEAKER_COLORS, height_px: int = 15) -> str:
    """Inline-SVG speaker barcode strip (spec: vis.py:147-189). The reference
    renders a matplotlib JPEG (fmt_img_speaker_barcode) or an SVG
    (fmt_svg_speaker_barcode); SVG needs no matplotlib and stays crisp, so it
    is the single implementation here."""
    if not transcript:
        return ''
    begin = begin if begin is not None else min(t.get('begin', 0.0) for t in transcript)
    end = end if end is not None else max(t.get('end', 0.0) for t in transcript)
    duration = max(end - begin, 1e-6)

    def color(speaker):
        s = speaker if isinstance(speaker, int) and speaker >= 0 else 0
        return colors[s % len(colors)]

    rects = '\n'.join(
        '<rect data-begin="{b}" data-end="{e}" x="{x:.4f}" width="{w:.4f}" height="1" '
        'style="fill:{c}"><title>speaker{s} | {b:.2f} - {e:.2f} [{d:.2f}]</title></rect>'
        .format(x=(t.get('begin', 0.0) - begin) / duration,
                w=max(t.get('end', 0.0) - t.get('begin', 0.0), 0.0) / duration,
                c=color(t.get('speaker', transcripts.speaker_missing)),
                s=t.get('speaker', transcripts.speaker_missing),
                b=t.get('begin', 0.0), e=t.get('end', 0.0),
                d=t.get('end', 0.0) - t.get('begin', 0.0))
        for t in transcript)
    return (f'<div style="width:100%; height:{height_px}px; border:1px solid black">'
            f'<svg viewBox="0 0 1 1" style="width:100%; height:100%" '
            f'preserveAspectRatio="none">{rects}</svg></div>')


def diarization(diarization_transcript: typing.List[dict], html_path: str,
                debug_audio: bool = False, sample_rate: int = 8000) -> str:
    """Diarization report (spec: vis.py:123-144): per-file ref/hyp speaker
    barcodes + SER/DER table with an average row. Each entry: dict(audio_name,
    audio_path?, ref=[segments], hyp=[segments], ser, der, der_)."""
    def avg(key):
        vals = [t.get(key, 0.0) for t in diarization_transcript]
        return sum(vals) / max(len(vals), 1)

    rows = ['<tr><th>audio_name</th><th>duration</th><th>refhyp</th><th>ser</th>'
            '<th>der</th><th>der_</th><th>audio</th><th>barcode</th></tr>',
            '<tr class="border-hyp"><td>{n}</td><td>{dur:.2f}</td><td>avg</td>'
            '<td>{ser:.2f}</td><td>{der:.2f}</td><td>{der_:.2f}</td><td></td><td></td></tr>'
            .format(n=len(diarization_transcript),
                    dur=sum(max((s.get('end', 0.0) for s in t.get('ref', [])), default=0.0)
                            for t in diarization_transcript),
                    ser=avg('ser'), der=avg('der'), der_=avg('der_'))]
    for dt in diarization_transcript:
        end = max((s.get('end', 0.0) for s in dt.get('ref', []) + dt.get('hyp', [])),
                  default=0.0)
        audio_html = ''
        if debug_audio and dt.get('audio_path'):
            try:
                signal, sr = audio_io.read_audio(dt['audio_path'],
                                                 sample_rate=sample_rate, mono=True)
                audio_html = (f'<audio controls style="width:100%" '
                              f'src="{audio_data_uri(signal[0], sr)}"></audio>')
            except Exception:
                audio_html = '(audio unavailable)'
        for refhyp in ['ref', 'hyp']:
            rows.append(
                '<tr class="border-{rh}"><td class="nowrap">{an}</td><td>{end:.2f}</td>'
                '<td>{rh}</td><td>{ser:.2f}</td><td>{der:.2f}</td><td>{der_:.2f}</td>'
                '<td>{audio}</td><td>{barcode}</td></tr>'.format(
                    rh=refhyp, an=dt.get('audio_name', ''), end=end,
                    ser=dt.get('ser', 0.0), der=dt.get('der', 0.0),
                    der_=dt.get('der_', 0.0),
                    audio=audio_html if refhyp == 'ref' else '',
                    barcode=fmt_svg_speaker_barcode(dt.get(refhyp, []), 0.0, end)))
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}<style>.nowrap{{white-space:nowrap}} '
                'table {border-collapse:collapse} '
                '.border-hyp {border-bottom: 2px black solid}</style></head><body>'
                '<table>' + '\n'.join(rows) + '</table></body></html>')
    return html_path


def audiosample(input_path: str, output_path: str, K: int,
                dataset_root: str = '', sample_rate: int = 8000) -> str:
    """K random playable samples per 'group' of a transcript json
    (spec: vis.py:612-639)."""
    import itertools
    import os
    import random
    with open(input_path) as f:
        transcript = json.load(f)
    group_of = lambda t: t.get('group', 'group not found')
    by_group = {k: list(g) for k, g in itertools.groupby(
        sorted(transcript, key=group_of), key=group_of)}
    parts = [f'<html><head>{META_CHARSET}</head><body>']
    for group, entries in sorted(by_group.items()):
        parts.append(f'<h1>{group}</h1><table>')
        random.seed(1)
        random.shuffle(entries)
        for t in entries[:K]:
            audio_path = os.path.join(dataset_root, t.get('audio_path', ''))
            # read_audio degrades to an empty signal on errors (reference
            # audio.py:102-104), so check existence explicitly
            if not os.path.exists(audio_path):
                parts.append(f'<tr><td>file not found: {audio_path}</td></tr>')
                continue
            try:
                signal, sr = audio_io.read_audio(audio_path, sample_rate=sample_rate,
                                                 mono=True)
                player = (f'<audio controls src='
                          f'"{audio_data_uri(signal[0], sr)}"></audio>')
            except Exception:
                parts.append(f'<tr><td>file not found: {audio_path}</td></tr>')
                continue
            parts.append(f'<tr><td>{audio_path}</td><td>{player}</td>'
                         f'<td>{t.get("ref", "")}</td></tr>')
        parts.append('</table>')
    parts.append('</body></html>')
    with open(output_path, 'w') as f:
        f.write('\n'.join(parts))
    return output_path


def words(train_data_path: str, val_data_path: str) -> typing.List[tuple]:
    """Val words under-represented in train (spec: vis.py:721-729): returns
    (word, val_count, train_count) for val words with count > 1 and fewer than
    1000 train occurrences. Input files are the reference's csv layout
    (`audio_path,transcript,...` per line)."""
    import collections
    count = lambda path: collections.Counter(
        w for line in open(path) for w in line.split(',')[1].split()
        if len(line.split(',')) > 1)
    train_cnt, val_cnt = count(train_data_path), count(val_data_path)
    return [(w, c, train_cnt[w]) for w, c in val_cnt.most_common()
            if c > 1 and train_cnt[w] < 1000]


ERROR_TAG_COLORS = dict(ok='green', missing='red', missing_ref='darkred',
                        typo_easy='lightgreen', typo_hard='pink')


def fmt_alignment(word_alignment, ref: bool = None, hyp: bool = None,
                  flat: bool = False, tag: str = '<pre>', prefix: bool = True) -> str:
    """Color-coded hyp/ref word alignment (spec: vis.py:738-755): each hyp
    word gets a span tinted by its error tag (ok/missing/missing_ref/
    typo_easy/typo_hard)."""
    def span(word, t=None):
        style = f'background-color:{ERROR_TAG_COLORS[t]}' if t in ERROR_TAG_COLORS else ''
        return f'<span style="{style}" title="{t}">{word}</span>'

    error_tag = lambda w: w.get('type') or w.get('error_tag')
    get_hyp = lambda w: w.get('_hyp_') or w.get('hyp', '')
    get_ref = lambda w: w.get('_ref_') or w.get('ref', '')
    if flat:
        ref_, hyp_ = get_ref(word_alignment), get_hyp(word_alignment)
    else:
        ref_ = ' '.join(span(get_ref(w), 'ok' if error_tag(w) == 'ok' else None)
                        for w in word_alignment)
        hyp_ = ' '.join(span(get_hyp(w), error_tag(w)) for w in word_alignment)
    ref_ = ('ref: ' if prefix else '') + ref_
    hyp_ = ('hyp: ' if prefix else '') + hyp_
    contents = '\n'.join([ref_] if ref is True else [hyp_] if hyp is True
                         else [ref_, hyp_])
    return tag + contents + tag.replace('<', '</')


def tabulate(experiments: typing.List[dict], metric: str = 'cer') -> str:
    """Plain-text table of metric vs iteration across experiments (spec:
    vis.py:688-718). Each experiment: dict(name, points=[(iteration, value)])."""
    lines = []
    for exp in experiments:
        lines.append(exp['name'])
        for iteration, value in exp.get('points', []):
            lines.append(f'  {iteration:>10} {metric}: {value:.4f}')
    return '\n'.join(lines)
