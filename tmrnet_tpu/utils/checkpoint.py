"""Checkpointing with orbax: save/restore/resume + best-model tracking.

The reference only saves (deep-copied best weights + per-epoch latest .pth with
metrics encoded in the filename, `train_singlenet_phase_1fc.py:708-735`) and
has no resume path. Here checkpoints carry params, batch_stats, optimizer
state and step, metrics live in a JSON sidecar (not the filename), `best` is a
tracked pointer with the reference's selection rule (val acc, tie-broken by
train acc), and training resumes from the latest checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """In a multi-process runtime, save() is collective across ALL
    processes (orbax's StandardCheckpointer barriers globally on its own;
    the pre-delete sync below matches that contract). Independent
    per-process trainings inside one multi-controller runtime would need a
    process-scoped checkpointer — not a supported configuration here."""

    def __init__(self, directory: str, keep: int = 3,
                 use_async: bool = False):
        self.dir = os.path.abspath(directory)
        self.keep = keep
        self.use_async = use_async
        os.makedirs(self.dir, exist_ok=True)
        # async: save() returns once the device->host snapshot is taken
        # (safe even with donated state buffers) and writes in a background
        # thread; wait() blocks until the write is durable
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if use_async else ocp.StandardCheckpointer())

    def wait(self) -> None:
        """Block until any in-flight async save is durable on disk (no-op
        for the sync checkpointer or when nothing is in flight)."""
        self._ckptr.wait_until_finished()

    # -- paths ------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.dir, f"step_{step:08d}")

    def _meta_path(self, step: int) -> str:
        return self._step_dir(step) + ".json"

    @property
    def best_dir(self) -> str:
        return os.path.join(self.dir, "best")

    # -- save/restore -------------------------------------------------------
    @staticmethod
    def _savable(state) -> Dict[str, Any]:
        return {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}

    def save(self, state, step: int, metrics: Optional[Dict] = None,
             is_best: bool = False) -> str:
        path = self._step_dir(step)
        import jax

        # one save in flight at a time: the previous epoch's background
        # write must be durable before this one's delete/exists logic runs
        self._ckptr.wait_until_finished()
        primary = jax.process_index() == 0
        if jax.process_count() > 1:
            if os.path.exists(path):
                # on a shared filesystem every process races to delete the
                # same tree; ENOENT from a peer's concurrent delete is fine
                shutil.rmtree(path, ignore_errors=True)
            from jax.experimental import multihost_utils

            # the delete must complete on every host before orbax's
            # existence check runs anywhere
            multihost_utils.sync_global_devices(f"tmrnet_ckpt_rm_{step}")
        elif os.path.exists(path):
            shutil.rmtree(path)  # single process: keep failures loud
        # every process participates in the orbax save (multi-controller
        # barriers run inside; the primary writes replicated data) ...
        self._ckptr.save(path, self._savable(state))
        if not self.use_async:
            self._ckptr.wait_until_finished()
        if not primary:
            # ... but the host-side sidecar/best/gc file ops are the
            # primary's alone — concurrent rmtree/copytree would race
            return path
        with open(self._meta_path(step), "w") as f:
            json.dump({"step": step, "metrics": metrics or {}}, f)
        if is_best:
            # the step tree must be complete before it is copied
            self._ckptr.wait_until_finished()
            # crash-safe replacement: stage the full copy first, then swap —
            # rmtree-before-copy left a window where a kill destroyed the
            # only copy of the best model (review r3)
            tmp = self.best_dir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            shutil.copytree(path, tmp)
            with open(tmp + ".json", "w") as f:
                json.dump({"step": step, "metrics": metrics or {}}, f)
            if os.path.exists(self.best_dir):
                shutil.rmtree(self.best_dir)
            os.replace(tmp, self.best_dir)
            os.replace(tmp + ".json", self.best_dir + ".json")
        # async + no best-wait: this step's write may still be in flight
        self._gc(pending=step if self.use_async and not is_best else None)
        return path

    def _gc(self, pending: Optional[int] = None) -> None:
        """Drop all but the newest `keep` steps. `pending`: a step whose
        async write may still be in flight (its dir is invisible until
        orbax finalizes) — counted toward the budget, never deleted; the
        newest DURABLE step is also protected so a crash mid-write always
        leaves at least one complete checkpoint."""
        steps = self.all_steps()
        protect = set()
        if pending is not None:
            protect.add(pending)
            durable = [s for s in steps if s != pending]
            if durable:
                protect.add(durable[-1])
            if pending not in steps:
                steps = sorted(steps + [pending])
        for s in steps[: max(0, len(steps) - self.keep)]:
            if s in protect:
                continue
            shutil.rmtree(self._step_dir(s), ignore_errors=True)
            try:
                os.remove(self._meta_path(s))
            except OSError:
                pass

    def all_steps(self):
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("step_") and not name.endswith(".json"):
                try:
                    out.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    @staticmethod
    def _restore_target(state):
        """Abstract target carrying each template leaf's SHARDING, so orbax
        restores straight into it — a template sharded over a global mesh
        resumes multi-controller (every process reads only its shards from
        the shared dir), instead of restoring process-local arrays whose
        re-shard would be an unsupported cross-host device_put."""
        import jax

        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding)
            if isinstance(x, jax.Array) else x,
            CheckpointManager._savable(state))

    def restore(self, state, step: Optional[int] = None):
        """Restore into a template TrainState (structure must match; leaf
        shardings are honored — see _restore_target)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.dir}")
        self._ckptr.wait_until_finished()  # async: latest must be durable
        restored = self._ckptr.restore(self._step_dir(step),
                                       self._restore_target(state))
        return state.replace(**restored)

    def restore_weights(self, variables: Dict[str, Any]) -> Dict[str, Any]:
        """Weights-only restore: params/batch_stats via orbax PARTIAL
        restore, ignoring the checkpoint's opt_state entirely. Loading a
        checkpoint for eval or to initialize a different trainer must not
        require the optimizer families to match (a stage-2 run with
        train.optimizer=adam crashed restoring its SGD stage-1 init with a
        structure mismatch) — and with no opt_state in the template, the
        round-4 silent-degrade class (opt-group mismatch -> sharding-file
        restore) cannot occur here at all. Explicit per-leaf shardings are
        passed (ArrayRestoreArgs) so orbax never falls back to the
        checkpoint's own sharding file, which only reconstructs on the
        saving topology. Prefers best/, falls back to the newest step."""
        import jax

        path = self.best_dir
        if not os.path.exists(path):
            if os.path.exists(path + ".tmp"):
                path = path + ".tmp"
            else:
                step = self.latest_step()
                if step is None:
                    raise FileNotFoundError(f"no checkpoints in {self.dir}")
                path = self._step_dir(step)
        self._ckptr.wait_until_finished()
        tpl = {k: variables[k] for k in ("params", "batch_stats")
               if variables.get(k)}
        tgt = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding)
            if isinstance(x, jax.Array) else x, tpl)
        rargs = jax.tree.map(
            lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding,
                                           dtype=x.dtype)
            if isinstance(x, jax.ShapeDtypeStruct) else ocp.RestoreArgs(),
            tgt)
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
            out = ck.restore(path, args=ocp.args.PyTreeRestore(
                item=tgt, restore_args=rargs, partial_restore=True))
        return {**variables, **out}

    def restore_best(self, state):
        best = self.best_dir
        if not os.path.exists(best):
            # a crash between the staged copy and the swap leaves the full
            # staged tree behind — recover from it rather than failing
            if os.path.exists(best + ".tmp"):
                best = best + ".tmp"
            else:
                raise FileNotFoundError(f"no best checkpoint in {self.dir}")
        self._ckptr.wait_until_finished()
        restored = self._ckptr.restore(best, self._restore_target(state))
        return state.replace(**restored)

    def metadata(self, step: int) -> Dict:
        """Step metadata; tolerates a sidecar lost to a crash between the
        orbax save and the JSON write (the checkpoint itself is valid —
        resume must not abort over missing metrics)."""
        try:
            with open(self._meta_path(step)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"step": step, "metrics": {}}

    def best_metadata(self) -> Dict:
        """Metadata of the best checkpoint ({} when absent) — lets a
        resumed run re-seed its BestTracker instead of overwriting the
        real best with the first post-resume epoch."""
        try:
            with open(self.best_dir + ".json") as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}


class BestTracker:
    """Reference selection rule: keep the epoch with the highest val accuracy,
    ties broken by train accuracy (`train_singlenet_phase_1fc.py:708-717`)."""

    def __init__(self):
        self.best_val = -1.0
        self.best_train = -1.0
        self.best_epoch = -1

    def update(self, epoch: int, val_acc: float, train_acc: float) -> bool:
        better = (val_acc > self.best_val
                  or (val_acc == self.best_val and train_acc > self.best_train))
        if better:
            self.best_val, self.best_train, self.best_epoch = (
                val_acc, train_acc, epoch)
        return better
