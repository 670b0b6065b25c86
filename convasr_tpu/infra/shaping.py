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


def ndim_of(marker) -> typing.Optional[int]:
    axes = getattr(marker, 'axes', None)
    return len(axes) if axes else None


def shapecheck(fn):
    """Validate annotated argument ndim at runtime (spec: shaping.py:52-83)."""
    signature = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = signature.bind(*args, **kwargs)
        for name, value in bound.arguments.items():
            annotation = signature.parameters[name].annotation
            expected = ndim_of(annotation)
            if expected is not None and hasattr(value, 'ndim'):
                assert value.ndim == expected, \
                    f'{fn.__name__}({name}): expected {annotation.axes} ' \
                    f'({expected}d), got {value.ndim}d shape {value.shape}'
        return fn(*args, **kwargs)
    return wrapper
