"""Process-wide performance meters (EMA / max / current per metric).

Behavior spec: /root/reference/perf.py:1-44 — a module-level singleton dict of
meters with exponential moving averages, outlier clamping against K*avg, and
max tracking. Keys are exposed flat as 'perf_<kind>_<name>'.
"""
import math
import typing

_meters: dict = {}
_default_K: float = 2.0


def init_default(K: float = 2.0):
    global _meters, _default_K
    _meters = {}
    _default_K = K


def update(values: typing.Dict[str, float], prefix: str = ''):
    """Update meters with new measurements (spec: perf.py:18-36)."""
    for name, value in values.items():
        value = float(value)
        if not math.isfinite(value):
            continue
        key = (prefix + '_' if prefix else '') + name
        meter = _meters.setdefault(key, dict(avg=0.0, max=0.0, cur=0.0))
        # clamp outliers to K * running average before folding into the EMA
        clamped = min(value, _default_K * meter['avg']) if meter['avg'] > 0 else value
        meter['avg'] = 0.9 * meter['avg'] + 0.1 * clamped if meter['avg'] > 0 else value
        meter['max'] = max(meter['max'], value)
        meter['cur'] = value


def default() -> typing.Dict[str, float]:
    """Flat snapshot: perf_avg_<name>, perf_max_<name>, perf_cur_<name>."""
    out = {}
    for name, meter in _meters.items():
        for kind in ['avg', 'max', 'cur']:
            out[f'perf_{kind}_{name}'] = meter[kind]
    return out


def reset():
    _meters.clear()
