"""Debug dump of intermediate pipeline buffers (SURVEY.md SS6
'Checkpoint / resume': the reference has no persistent state -- render
textures are transient -- so the TPU-native plan is an optional dump of the
intermediate pyramids for debugging/inspection).

Uses tensorstore when available (zarr driver, one array per buffer);
falls back to ``numpy.savez_compressed``.
"""

from __future__ import annotations

import os

import numpy as np


def _flatten(debug: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    for k, v in debug.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix=f"{key}/"))
        elif v is not None:
            flat[key] = np.asarray(v)
    return flat


def dump_debug_buffers(debug: dict, path: str, use_tensorstore: bool | None = None):
    """Persist a pipeline ``debug_outputs`` dict.

    ``path`` ending in ``.npz`` (or tensorstore unavailable) -> one npz file;
    otherwise a zarr directory tree with one array per buffer.
    Returns the list of buffer names written.
    """
    flat = _flatten(debug)
    if use_tensorstore is None:
        use_tensorstore = not path.endswith(".npz")
    if use_tensorstore:
        try:
            import tensorstore as ts
        except ImportError:
            use_tensorstore = False
    if not use_tensorstore:
        if not path.endswith(".npz"):
            path = path + ".npz"
        np.savez_compressed(path, **{k.replace("/", "."): v
                                     for k, v in flat.items()})
        return sorted(flat)

    os.makedirs(path, exist_ok=True)
    for name, arr in flat.items():
        spec = {
            "driver": "zarr",
            "kvstore": {"driver": "file",
                        "path": os.path.join(path, name)},
            "metadata": {"dtype": arr.dtype.str, "shape": list(arr.shape)},
            "create": True,
            "delete_existing": True,
        }
        store = ts.open(spec).result()
        store[...] = arr
    return sorted(flat)


def load_debug_buffers(path: str) -> dict[str, np.ndarray]:
    """Inverse of dump_debug_buffers (npz or zarr tree)."""
    if path.endswith(".npz") or os.path.isfile(path):
        # restore the '/'-nested keys dump rewrote for npz, so both
        # backends round-trip to identical key sets
        with np.load(path) as z:
            return {k.replace(".", "/"): z[k] for k in z.files}
    import tensorstore as ts

    out = {}
    for root, dirs, files in os.walk(path):
        if ".zarray" in files:
            rel = os.path.relpath(root, path)
            spec = {"driver": "zarr",
                    "kvstore": {"driver": "file", "path": root}}
            out[rel] = np.asarray(ts.open(spec).result())
            dirs.clear()
    return out
