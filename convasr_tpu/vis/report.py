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
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}<style>{_style()}</style></head><body>'
                f'<script>{PLAY_SCRIPT}</script>'
                f'<h4>{audio_name}</h4>{players}<hr/>'
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
           strip_audio_path_prefix: str = '') -> str:
    """Multi-run error comparison table (spec: vis.py:454-609). `runs` maps
    run-name -> list of analyzed dicts (hyp/ref/cer per utterance)."""
    names = list(runs)
    by_example: typing.Dict[str, dict] = {}
    for name in names:
        for t in runs[name]:
            key = t.get('audio_path', '') + '|' + t.get('ref', '')
            by_example.setdefault(key, {})[name] = t

    header = '<tr><th>ref</th>' + ''.join(
        f'<th>{name} hyp</th><th>cer</th>' for name in names) + '</tr>'
    rows = []
    for key, entries in by_example.items():
        any_entry = next(iter(entries.values()))
        cells = [f'<td class="reference">{any_entry.get("ref", "")}</td>']
        for name in names:
            t = entries.get(name, {})
            cer = t.get('cer', transcripts._er_missing)
            cells.append(f'<td>{t.get("hyp", "")}</td>')
            cells.append(f'<td>{cer:.2%}</td>' if cer != transcripts._er_missing
                         else '<td>N/A</td>')
        rows.append('<tr>' + ''.join(cells) + '</tr>')
    with open(html_path, 'w') as f:
        f.write(f'<html><head>{META_CHARSET}<style>{_style()}</style></head><body>'
                f'<table>{header}' + '\n'.join(rows) + '</table></body></html>')
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


def tabulate(experiments: typing.List[dict], metric: str = 'cer') -> str:
    """Plain-text table of metric vs iteration across experiments (spec:
    vis.py:688-718). Each experiment: dict(name, points=[(iteration, value)])."""
    lines = []
    for exp in experiments:
        lines.append(exp['name'])
        for iteration, value in exp.get('points', []):
            lines.append(f'  {iteration:>10} {metric}: {value:.4f}')
    return '\n'.join(lines)
