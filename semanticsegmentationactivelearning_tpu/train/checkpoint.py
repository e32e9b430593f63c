"""Checkpointing: msgpack state files + a two-phase best-checkpoint
manager (reference: tensortools/checkpoint_manager.py, tf.train.Checkpoint
usage at train.py:225-257).

A checkpoint is one file ``{prefix}-{N}.ckpt`` holding the full
``TrainState`` (params, batch_stats, opt_state, step, epoch) via flax
msgpack serialization. Directory state lives in ``checkpoint.json``
(the analogue of TF's ``checkpoint`` state file, checkpoint_manager.py:71-72).

Manager protocol preserved from the reference:

- ``cache(state)``      write to the ``tmp`` prefix each epoch (22-33)
- ``commit(prefix)``    rename cache -> ``{prefix}-{N}`` only when the
                        caller observed an improvement; bumps the save
                        counter; FIFO-prunes to ``max_to_keep`` (35-73)
- ``chdir(directory)``  per-AL-round subdirectories (75-86); the save
                        counter survives, matching the in-graph counter
- ``save(prefix, state)`` unconditional save (95-105)
"""

from __future__ import annotations

import json
import os
from typing import Optional

import flax.serialization
import jax

CKPT_EXT = ".ckpt"
STATE_FILE = "checkpoint.json"


def save_checkpoint(path: str, state) -> str:
    """Serialize a TrainState (or any pytree) to ``path`` atomically."""
    state = jax.device_get(state)
    data = flax.serialization.to_bytes(state)
    tmp = path + ".part"
    with open(tmp, "wb") as fp:
        fp.write(data)
    os.replace(tmp, path)
    return path


_snapshot_jit = None


def _device_snapshot(state):
    """On-device copy of every jax.Array leaf. The train step DONATES
    its input TrainState (donate_argnums), so a background checkpoint
    thread fetching the original buffers would race their deletion by
    the next step ("Buffer has been deleted or donated"); the copies
    are not part of any donated pytree, so the async fetch is safe.
    The whole-tree copy runs as ONE jitted dispatch (a per-leaf eager
    copy would pay the ~26ms relay round-trip hundreds of times),
    sequenced before any later donation by data dependence. Non-array
    leaves pass through host-side."""
    import jax.numpy as jnp

    global _snapshot_jit
    if _snapshot_jit is None:
        _snapshot_jit = jax.jit(
            lambda s: jax.tree.map(jnp.copy, s))
    if all(isinstance(x, jax.Array) for x in jax.tree.leaves(state)):
        return _snapshot_jit(state)
    # mixed pytree (host leaves): fall back to per-leaf copies
    return jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
        state)


def _convert_flat_layout(target, source):
    """Convert optimizer moments between the per-leaf and the
    ``optax.flatten``-raveled layouts (both use ``jax.tree.flatten``
    leaf order, so a ravel+concat / split+reshape round-trips exactly).
    Returns ``None`` when the structures aren't that pair (e.g. a
    genuinely different param set)."""
    import numpy as np
    if isinstance(source, dict) and not isinstance(target, dict):
        # old per-leaf checkpoint -> flattened template
        leaves = jax.tree.leaves(source)
        if (getattr(target, "ndim", None) == 1 and leaves
                and all(hasattr(lf, "ravel") for lf in leaves)
                and sum(int(np.size(lf)) for lf in leaves)
                == int(np.size(target))):
            flat = np.concatenate(
                [np.ravel(np.asarray(lf)) for lf in leaves])
            return flat.astype(np.asarray(target).dtype)
    if isinstance(target, dict) and not isinstance(source, dict):
        # flattened checkpoint -> per-leaf template
        t_leaves, t_def = jax.tree.flatten(target)
        src = np.asarray(source)
        if (src.ndim == 1 and t_leaves
                and all(hasattr(lf, "shape") for lf in t_leaves)
                and sum(int(np.size(lf)) for lf in t_leaves)
                == int(src.size)):
            out, off = [], 0
            for lf in t_leaves:
                n = int(np.size(lf))
                out.append(src[off:off + n]
                           .reshape(np.shape(lf))
                           .astype(np.asarray(lf).dtype))
                off += n
            return jax.tree.unflatten(t_def, out)
    return None


def _merge_state_dicts(target, source, path=""):
    """Recursively copy matching-shape leaves of ``source`` into
    ``target``; report what didn't line up."""
    import logging
    logger = logging.getLogger(__name__)
    if isinstance(target, dict) and isinstance(source, dict):
        merged = {}
        for key, tval in target.items():
            if key in source:
                merged[key] = _merge_state_dicts(tval, source[key],
                                                 f"{path}/{key}")
            else:
                logger.debug("checkpoint missing %s/%s; keeping init",
                             path, key)
                merged[key] = tval
        return merged
    if isinstance(target, dict) != isinstance(source, dict):
        # dict-vs-array: a checkpoint written with the other optimizer
        # moment layout (optax.flatten, train/optim.py) — convert it
        converted = _convert_flat_layout(target, source)
        if converted is not None:
            logger.info("checkpoint optimizer layout converted at %s "
                        "(per-leaf <-> flattened)", path)
            return converted
        logger.warning("checkpoint structure mismatch at %s; "
                       "keeping init", path)
        return target
    t_shape = getattr(target, "shape", None)
    s_shape = getattr(source, "shape", None)
    if t_shape is not None and s_shape is not None and t_shape != s_shape:
        logger.warning("checkpoint shape mismatch at %s: %s vs %s; "
                       "keeping init", path, s_shape, t_shape)
        return target
    return source


def restore_checkpoint(path: str, template, partial: bool = True):
    """Restore into the structure of ``template`` (a freshly created
    TrainState), the object-based-restore analogue of
    tf.train.Checkpoint.restore (train.py:241-246).

    ``partial=True`` mirrors the reference's ``expect_partial``
    semantics (train.py:243-245): checkpoint entries absent from the
    template are ignored, template entries absent from the checkpoint
    keep their fresh initialization — e.g. restoring a
    multiscale-pretrained model into a non-multiscale run or vice
    versa."""
    if os.path.isdir(path):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"No checkpoint found in {path}")
        path = latest
    if not os.path.exists(path) and os.path.exists(path + CKPT_EXT):
        path = path + CKPT_EXT
    with open(path, "rb") as fp:
        data = fp.read()
    if not partial:
        return flax.serialization.from_bytes(template, data)
    restored = flax.serialization.msgpack_restore(data)
    target_dict = flax.serialization.to_state_dict(template)
    merged = _merge_state_dicts(target_dict, restored)
    return flax.serialization.from_state_dict(template, merged)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the newest committed checkpoint in ``directory``
    (tf.train.latest_checkpoint analogue)."""
    state_path = os.path.join(directory, STATE_FILE)
    if os.path.exists(state_path):
        with open(state_path) as fp:
            meta = json.load(fp)
        latest = meta.get("latest")
        if latest:
            path = os.path.join(directory, latest)
            if os.path.exists(path):
                return path
    # Fallback: newest .ckpt by number
    if not os.path.isdir(directory):
        return None
    candidates = [f for f in os.listdir(directory) if f.endswith(CKPT_EXT)
                  and not f.startswith("tmp")]
    if not candidates:
        return None

    def _num(name):
        stem = name[:-len(CKPT_EXT)]
        try:
            return int(stem.rsplit("-", 1)[1])
        except (IndexError, ValueError):
            return -1

    return os.path.join(directory, max(candidates, key=_num))


class CheckpointManager:
    """Two-phase best-checkpoint manager (see module docstring).

    ``async_io=True`` runs each ``cache``/``save`` serialization
    (device->host fetch + msgpack + write) on a background thread so it
    overlaps the next epoch's compute — the fetch of a full TrainState
    through the TPU relay costs seconds per epoch otherwise. The
    submitted pytree is an on-device snapshot (``_device_snapshot``)
    because the train step donates its input state's buffers;
    ``commit``/``chdir``/``close`` join the in-flight write first, and
    a failed background write re-raises there."""

    def __init__(self, directory: str, max_to_keep: int = 10,
                 async_io: bool = False):
        self._directory = directory
        self._max_to_keep = max_to_keep
        self._checkpoints = []          # committed paths, oldest first
        self._cached: Optional[str] = None
        self._save_counter = 0
        self._async = async_io
        self._pool = None
        self._pending = None
        if async_io:
            # surface a failed final background write even when the
            # caller's normal close() is skipped by an exception path
            # (ThreadPoolExecutor's own atexit join swallows errors)
            import atexit
            atexit.register(self._atexit_close)
        os.makedirs(directory, exist_ok=True)
        # Resume counter + FIFO from a previous run in this directory so
        # new saves never overwrite existing checkpoints (the reference
        # persisted save_counter inside the TF checkpoint object,
        # checkpoint_manager.py:52-58).
        self._load_state_file()

    def _submit(self, fn, *args):
        import concurrent.futures
        if self._pool is None:
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-io")
        self._pending = self._pool.submit(fn, *args)

    def _join(self) -> None:
        """Wait for the in-flight background write; re-raises its
        error."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self) -> None:
        """Flush and stop the background writer (no-op when sync)."""
        try:
            self._join()
        finally:
            if self._pool is not None:
                self._pool.shutdown(wait=True)
                self._pool = None

    def _atexit_close(self) -> None:
        import logging
        try:
            self.close()
        except Exception:
            logging.getLogger(__name__).exception(
                "background checkpoint write failed at exit")

    def _load_state_file(self) -> None:
        """Adopt ``checkpoint.json`` from the current directory: restore
        the save counter (never going backwards) and the committed-FIFO
        so resumed runs never overwrite existing checkpoints."""
        state_path = os.path.join(self._directory, STATE_FILE)
        if not os.path.exists(state_path):
            return
        try:
            with open(state_path) as fp:
                meta = json.load(fp)
            self._save_counter = max(self._save_counter,
                                     int(meta.get("save_counter", 0)))
            self._checkpoints = [
                os.path.join(self._directory, name)
                for name in meta.get("checkpoints", [])
                if os.path.exists(os.path.join(self._directory, name))]
        except (ValueError, OSError):
            pass

    @property
    def directory(self) -> str:
        return self._directory

    @property
    def latest_checkpoint(self) -> str:
        return self._checkpoints[-1] if self._checkpoints else ""

    @property
    def save_counter(self) -> int:
        return self._save_counter

    def set_save_counter(self, value: int) -> None:
        """Re-seed the counter, e.g. after restoring mid-run state."""
        self._save_counter = int(value)

    def _cache_path(self) -> str:
        return os.path.join(self._directory, "tmp" + CKPT_EXT)

    def cache(self, state) -> str:
        """Stash the epoch's state under the tmp prefix
        (checkpoint_manager.py:22-33)."""
        if self._async:
            self._join()  # at most one write in flight
            self._submit(save_checkpoint, self._cache_path(),
                         _device_snapshot(state))
            self._cached = self._cache_path()
            return self._cached
        self._cached = save_checkpoint(self._cache_path(), state)
        return self._cached

    def commit(self, prefix: str = "model") -> str:
        """Promote the cached checkpoint to ``{prefix}-{N}``; no-op
        returning the last committed path when nothing is cached
        (checkpoint_manager.py:35-73)."""
        if self._cached is None:
            return self._checkpoints[-1] if self._checkpoints else ""
        self._join()  # the cached file must exist before the rename

        victim = None
        if len(self._checkpoints) >= self._max_to_keep:
            victim = self._checkpoints.pop(0)

        self._save_counter += 1
        name = f"{os.path.basename(prefix)}-{self._save_counter}{CKPT_EXT}"
        target = os.path.join(self._directory, name)
        os.replace(self._cached, target)
        self._cached = None
        self._checkpoints.append(target)
        # Evict only after the replacement landed: a crash in between
        # must never leave fewer checkpoints on disk than before.
        if victim is not None and os.path.exists(victim):
            os.remove(victim)
        self._write_state_file()
        return target

    def save(self, prefix: str, state) -> str:
        """Unconditional numbered save (checkpoint_manager.py:95-105;
        the plain train CLI's per-epoch save, train.py:352)."""
        if self._async:
            # The in-flight job reads self._checkpoints; settle it
            # before mutating the FIFO below.
            self._join()
        self._save_counter += 1
        name = f"{os.path.basename(prefix)}-{self._save_counter}{CKPT_EXT}"
        target = os.path.join(self._directory, name)
        victim = None
        if len(self._checkpoints) >= self._max_to_keep:
            victim = self._checkpoints.pop(0)
        self._checkpoints.append(target)
        if self._async:
            snap = _device_snapshot(state)

            def job():
                # checkpoint.json is updated only AFTER the file
                # lands, so "latest" never points at a missing file;
                # the eviction victim outlives its replacement too.
                save_checkpoint(target, snap)
                if victim is not None and os.path.exists(victim):
                    os.remove(victim)
                self._write_state_file()
            self._submit(job)
        else:
            save_checkpoint(target, state)
            if victim is not None and os.path.exists(victim):
                os.remove(victim)
            self._write_state_file()
        return target

    def chdir(self, directory: str) -> None:
        """Switch output directory (per-AL-round subdirs,
        checkpoint_manager.py:75-86); clears any uncommitted cache,
        keeps the save counter, and adopts the target directory's
        ``checkpoint.json`` so re-entering a round after an interrupted
        run resumes its counter/FIFO instead of overwriting its
        ``model-N`` files."""
        self._join()  # don't race a background write of the old cache
        if self._cached is not None and os.path.exists(self._cached):
            os.remove(self._cached)
        self._cached = None
        self._checkpoints = []
        self._directory = directory
        os.makedirs(directory, exist_ok=True)
        self._load_state_file()

    def _write_state_file(self) -> None:
        meta = {
            "latest": os.path.basename(self._checkpoints[-1]),
            "checkpoints": [os.path.basename(p)
                            for p in self._checkpoints],
            "save_counter": self._save_counter,
        }
        with open(os.path.join(self._directory, STATE_FILE), "w") as fp:
            json.dump(meta, fp, indent=2)


def reinitialize_final_layer(state, model, rng, input_hw,
                             channels: int = 3):
    """Fresh glorot re-init of the output layer, the ``-r`` transfer
    option (active_learning.py:461-462, 905-910).

    The output module is resolved from the model
    (``model.output_module``: "Final" for ENet, "Classifier" for
    ICNet) rather than hardcoded, so the flag works for every model
    family."""
    import jax.numpy as jnp

    head = getattr(model, "output_module", None)
    if head is None or head not in state.params:
        raise KeyError(
            f"Cannot reinitialize output layer: model "
            f"{type(model).__name__} declares output_module="
            f"{head!r} but params have {sorted(state.params)}")

    @jax.jit
    def _init(key):
        dummy = jnp.zeros((1, input_hw[0], input_hw[1], channels),
                          jnp.float32)
        return model.init({"params": key,
                           "dropout": jax.random.PRNGKey(0)},
                          dummy, training=True)["params"]

    fresh = _init(rng)
    params = dict(state.params)
    params[head] = fresh[head]
    return state.replace(params=params)
