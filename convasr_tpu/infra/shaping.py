"""Tensor-shape marker types + optional runtime shape checking.

Behavior spec: /root/reference/shaping.py:6-83 — single-letter axis algebra
(B batch, C channels, T time, t downsampled time, S speakers, L labels/
pipelines, Y targets) used as documentation-grade annotations, plus a
`shapecheck` decorator that validates annotated ndim at call time.
"""
import functools
import inspect
import typing



class ShapeType:
    axes: str = ''

    def __class_getitem__(cls, item):
        return cls


def _make(axes: str):
    return type(axes, (ShapeType,), dict(axes=axes))


# the reference's markers (shaping.py:6-45)
# BTC is this repo's addition: the reference is channels-first (BCT) but
# everything on device here is channels-last (B, T, C).
B = _make('B')
BTC = _make('BTC')
TC = _make('TC')
BS = _make('BS')
BT = _make('BT')
Bt = _make('Bt')
BCT = _make('BCT')
BCt = _make('BCt')
BLY = _make('BLY')
BY = _make('BY')
CT = _make('CT')
T = _make('T')
_T = _make('_T')
S = _make('S')


def axes_of(annotation) -> typing.Optional[str]:
    """Marker axes string, unwrapping typing.Optional/Union annotations so
    `mask: typing.Optional[shaping.BT]` is still checked when a value is
    actually passed."""
    axes = getattr(annotation, 'axes', None)
    if axes:
        return axes
    for arg in typing.get_args(annotation):
        axes = getattr(arg, 'axes', None)
        if axes:
            return axes
    return None


def ndim_of(marker) -> typing.Optional[int]:
    axes = axes_of(marker)
    return len(axes) if axes else None


def shapecheck(fn):
    """Validate annotated arguments at call time (spec: shaping.py:52-83):
    rank must match the marker, and a shared axis letter (e.g. B) must have
    the SAME size across every annotated argument — ctc_loss(log_probs (2,T,C),
    targets (3,Y)) fails here with a named axis instead of a downstream
    broadcast error. '_' in a marker is a wildcard axis. Cost is trace-time
    only under jit (shapes are static)."""
    signature = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = signature.bind(*args, **kwargs)
        dims: dict = {}
        for name, value in bound.arguments.items():
            annotation = signature.parameters[name].annotation
            axes = axes_of(annotation)
            if not axes or not hasattr(value, 'ndim'):
                continue
            assert value.ndim == len(axes), \
                f'{fn.__name__}({name}): expected {axes} ' \
                f'({len(axes)}d), got {value.ndim}d shape {value.shape}'
            for letter, size in zip(axes, value.shape):
                if letter == '_':
                    continue
                prev = dims.setdefault(letter, (name, size))
                assert prev[1] == size, \
                    f'{fn.__name__}({name}): axis {letter}={size} ' \
                    f'inconsistent with {prev[0]} ({letter}={prev[1]})'
        return fn(*args, **kwargs)
    return wrapper


def check_xlen(xlen, batch: int, name: str = 'xlen'):
    """Enforce the valid-length-FRACTION convention (SURVEY §7.3 calls it the
    main WER-parity risk): xlen must be a (B,) FLOATING array — an integer
    dtype almost certainly means absolute frame/sample lengths were passed
    where the collate fraction (data/dataset.py collate_fn) is expected.
    Returns xlen unchanged; trace-time-only cost under jit."""
    if xlen is None:
        return None
    assert hasattr(xlen, 'ndim') and xlen.ndim == 1, \
        f'{name}: expected (B,) valid-length fractions, got ' \
        f'{getattr(xlen, "shape", type(xlen))}'
    assert xlen.shape[0] == batch, \
        f'{name}: batch {xlen.shape[0]} != input batch {batch}'
    import numpy as np
    assert np.issubdtype(np.dtype(xlen.dtype), np.floating), \
        f'{name}: dtype {xlen.dtype} — xlen is the valid FRACTION of the ' \
        f'padded time dim (float in (0, 1]), not absolute lengths'
    return xlen
