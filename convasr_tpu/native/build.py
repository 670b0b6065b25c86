"""On-demand g++ builds of the in-repo native components, cached by source hash."""
import ctypes
import hashlib
import os
import subprocess
import tempfile
import typing

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_cache: dict = {}


def build_library(source_name: str) -> typing.Optional[str]:
    """Compile native/<source_name> to a cached .so; returns its path or None
    when no compiler is available."""
    src = os.path.join(NATIVE_DIR, source_name)
    with open(src, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), 'convasr_tpu_native')
    os.makedirs(cache_dir, exist_ok=True)
    stem = os.path.splitext(source_name)[0]
    lib_path = os.path.join(cache_dir, f'{stem}_{digest}.so')
    if os.path.exists(lib_path):
        return lib_path
    try:
        subprocess.check_call(['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
                               src, '-o', lib_path + '.tmp'])
        os.replace(lib_path + '.tmp', lib_path)
        return lib_path
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def load_library(source_name: str) -> typing.Optional[ctypes.CDLL]:
    if source_name in _cache:
        return _cache[source_name]
    path = build_library(source_name)
    lib = ctypes.CDLL(path) if path else None
    _cache[source_name] = lib
    return lib
