"""Persistent frame-index cache + resumable pass state.

The reference's random-access machinery (per-frame byte-size headers,
`xdrfile_jump.c:25-60`; O(1) skip in molly) is what lets any analysis
restart from a time offset.  Here the analogue is explicit and durable:

- `load_index`/`save_index`: the O(frames) scan result (offsets, steps,
  times) is cached in a per-user cache directory
  (`$GROAN_INDEX_CACHE_DIR` or `~/.cache/groan_rs_tpu`), keyed by the
  trajectory's absolute path + size + mtime, so reopening a large
  trajectory skips the scan entirely and multi-host deployments can shard
  a file by byte offsets without rescanning (SURVEY §5 checkpoint/resume).
  The cache never writes next to the trajectory (data directories are
  often read-only or shared).
- `PassState`: a resumable trajectory-pass checkpoint — the frame cursor
  plus an arbitrary partial-reduction pytree — serialized with numpy.
"""

from __future__ import annotations

import os

import numpy as np

_MAGIC = "groan-gxidx-v2"


def _fingerprint(path) -> tuple[int, int]:
    st = os.stat(path)
    return int(st.st_size), int(st.st_mtime_ns)


def _cache_dir() -> str:
    return os.environ.get(
        "GROAN_INDEX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "groan_rs_tpu"),
    )


def index_path(path) -> str:
    import hashlib

    key = hashlib.sha256(os.path.abspath(str(path)).encode()).hexdigest()[:24]
    return os.path.join(_cache_dir(), f"idx-{key}.npz")


def save_index(path, arrays: dict) -> None:
    """Cache a frame index in the user cache dir (best-effort)."""
    size, mtime = _fingerprint(path)
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        np.savez(index_path(path)[:-4], __magic__=_MAGIC, __size__=size,
                 __mtime__=mtime, **arrays)
    except OSError:
        pass


def load_index(path) -> dict | None:
    """Load a cached frame index if it exists and still matches the file."""
    ip = index_path(path)
    if not os.path.exists(ip):
        return None
    try:
        with np.load(ip, allow_pickle=False) as z:
            if str(z["__magic__"]) != _MAGIC:
                return None
            size, mtime = _fingerprint(path)
            if int(z["__size__"]) != size or int(z["__mtime__"]) != mtime:
                return None
            return {k: z[k] for k in z.files if not k.startswith("__")}
    except Exception:
        return None


class PassState:
    """Resumable trajectory-pass state: frames processed so far + the
    partial device reduction (host-serialized).

    Usage with the map-reduce engine:

        state = PassState.load(path) or PassState()
        ... run batches starting at state.cursor, fold into carry ...
        state.update(cursor, carry); state.save(path)
    """

    def __init__(self, cursor: int = 0, carry=None):
        self.cursor = int(cursor)
        self.carry = carry

    def update(self, cursor: int, carry):
        self.cursor = int(cursor)
        self.carry = carry
        return self

    def save(self, path) -> None:
        import jax

        leaves, treedef = jax.tree.flatten(self.carry)
        np.savez(
            str(path),
            __magic__=_MAGIC,
            __cursor__=self.cursor,
            __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
        )

    @classmethod
    def load(cls, path, like=None) -> "PassState | None":
        """Load a checkpoint; `like` is an example carry pytree used to
        restore the tree structure (its leaf VALUES are ignored)."""
        import jax

        p = str(path)
        if not os.path.exists(p) and os.path.exists(p + ".npz"):
            p = p + ".npz"
        if not os.path.exists(p):
            return None
        try:
            with np.load(p, allow_pickle=False) as z:
                if str(z["__magic__"]) != _MAGIC:
                    return None
                cursor = int(z["__cursor__"])
                leaves = [z[f"leaf_{i}"] for i in range(
                    sum(1 for k in z.files if k.startswith("leaf_")))]
        except Exception:
            return None
        if like is not None:
            _, treedef = jax.tree.flatten(like)
            carry = jax.tree.unflatten(treedef, leaves)
        elif len(leaves) == 1:
            carry = leaves[0]
        else:
            carry = leaves
        return cls(cursor, carry)
