"""Checkpointing: orbax top-k saver + torch state_dict importer.

Reference semantics (SURVEY.md §5.4): Lightning ModelCheckpoint keeps
top-k on val_loss plus a last checkpoint (simple_lstm/trainer.py:33-41,
lstmformer/trainer.py:33-57); restore is torch.load(...)["state_dict"]
(model_loader.py:13-26). Here:

  * TopKCheckpointer: orbax PyTreeCheckpointer, dirs V{epoch}-{val_loss}
    mirroring the reference's filename scheme, plus `last`.
  * import_torch_state_dict: maps a torch state_dict (tensors already
    converted to numpy arrays — e.g. via `torch.load` elsewhere) onto a
    flax params pytree, transposing Linear kernels and splitting MHA
    in_proj weights. This preserves the reference's public ckpt format.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _make_pytree_checkpointer(use_async: bool = False):
    """PyTreeCheckpointer whose process barriers involve ONLY this rank.

    Under multi-process jax (jax.distributed), Checkpointer.save opens
    with sync_global_processes across active_processes. The Trainer
    writes checkpoints from rank 0 only (payloads are host numpy of
    fully-replicated params) — with the default active_processes=ALL,
    that single-rank save would barrier-wait on ranks that never call
    save and deadlock the whole fit. Scoping active_processes to the
    calling rank makes the save purely local, which is exactly its
    semantics here.

    use_async: saves return immediately and serialize to disk on a
    background thread (orbax AsyncCheckpointer) so the next epoch's
    steps overlap the write; TopKCheckpointer keeps at most one save in
    flight and exposes wait() for the end-of-fit flush.
    """
    if jax.process_count() == 1:
        if use_async:
            return ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler(use_ocdbt=True)
            )
        return ocp.PyTreeCheckpointer()
    me = jax.process_index()
    mp = ocp.options.MultiprocessingOptions(
        primary_host=me, active_processes={me}
    )
    cls = ocp.AsyncCheckpointer if use_async else ocp.Checkpointer
    return cls(
        ocp.PyTreeCheckpointHandler(use_ocdbt=True),
        multiprocessing_options=mp,
    )


class TopKCheckpointer:
    def __init__(
        self,
        directory: str,
        top_k: int = 5,
        monitor: str = "V",
        use_async: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self.use_async = use_async
        self._saved: List[Tuple[float, str]] = []  # (val_loss, path)
        self._ckpt = _make_pytree_checkpointer(use_async)
        # seed from checkpoints already on disk so a resumed run compares
        # against and prunes the previous run's top-k (like Lightning's
        # ModelCheckpoint best_k_models restore)
        for name in sorted(os.listdir(self.directory)):
            if not name.startswith(self.monitor):
                continue
            try:
                val_loss = float(name[len(self.monitor):].split("-", 1)[1])
            except (IndexError, ValueError):
                continue
            self._saved.append((val_loss, os.path.join(self.directory, name)))
        self._saved.sort()
        # prune beyond-top-k dirs found on disk NOW: once dropped from
        # _saved they would otherwise be orphaned forever, breaking the
        # advertised top-k disk bound on resume
        for _, stale in self._saved[self.top_k:]:
            shutil.rmtree(stale, ignore_errors=True)
        del self._saved[self.top_k:]

    def wait(self):
        """Block until any in-flight async save is on disk (no-op sync)."""
        if self.use_async:
            self._ckpt.wait_until_finished()

    def _save(self, path: str, params, opt_state, epoch: int):
        # at most ONE async save in flight: the previous epoch's write
        # overlaps this epoch's compute, and pruning below never races
        # an unfinished serialization
        self.wait()
        if os.path.exists(path):
            shutil.rmtree(path)
        # OWNED host copies, not views: np.asarray of a CPU jax array is
        # zero-copy, and with async saves the donated device buffer is
        # deleted by the next train step while the writer still reads it
        copy = lambda x: np.array(x)
        payload = {
            "params": jax.tree_util.tree_map(copy, params),
            "epoch": epoch,
        }
        if opt_state is not None:
            # store the optimizer state's array leaves flattened; the tree
            # structure is rebuilt from optimizer.init(params) on restore
            leaves = jax.tree_util.tree_leaves(opt_state)
            payload["opt_leaves"] = [copy(x) for x in leaves]
        self._ckpt.save(path, payload)

    def maybe_save(self, params, opt_state, epoch: int, val_loss: float):
        name = f"{self.monitor}{epoch}-{val_loss:.6f}"
        path = os.path.join(self.directory, name)
        if len(self._saved) < self.top_k:
            self._save(path, params, opt_state, epoch)
            self._saved.append((val_loss, path))
            self._saved.sort()
            return True
        worst_loss, worst_path = self._saved[-1]
        if val_loss < worst_loss:
            self._save(path, params, opt_state, epoch)
            if os.path.exists(worst_path):
                shutil.rmtree(worst_path)
            self._saved[-1] = (val_loss, path)
            self._saved.sort()
            return True
        return False

    def save_last(self, params, opt_state, epoch: int):
        self._save(os.path.join(self.directory, "last"), params, opt_state, epoch)

    def best_path(self) -> Optional[str]:
        return self._saved[0][1] if self._saved else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    return _make_pytree_checkpointer().restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# torch -> flax import
# ---------------------------------------------------------------------------


def _assign(tree: Dict[str, Any], dotted: str, value: np.ndarray):
    parts = dotted.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def import_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    name_map: Dict[str, str],
) -> Dict[str, Any]:
    """Build a flax params dict from torch tensors.

    ``name_map``: torch prefix -> flax path prefix. Rules applied:
      * ``*.weight`` of Linear layers -> ``kernel`` transposed (out,in)->(in,out)
      * ``*.bias`` -> ``bias``
      * LSTM/GRU ``weight_ih_l*``/``bias_*`` copied verbatim (our recurrent
        params use torch layout by construction, nn/recurrent.py)
      * LayerNorm weight/bias -> scale/bias
      * MHA in_proj_weight/bias split into q/k/v thirds
    """
    params: Dict[str, Any] = {}
    for tname, array in state_dict.items():
        flax_prefix = None
        rest = None
        for prefix, mapped in sorted(name_map.items(), key=lambda x: -len(x[0])):
            if tname.startswith(prefix):
                flax_prefix = mapped
                rest = tname[len(prefix) :].lstrip(".")
                break
        if flax_prefix is None:
            continue
        array = np.asarray(array)

        if "in_proj_weight" in rest:
            for part, sub in zip(("q", "k", "v"), np.split(array, 3, axis=0)):
                _assign(params, f"{flax_prefix}/{part}_proj_weight", sub)
            continue
        if "in_proj_bias" in rest:
            for part, sub in zip(("q", "k", "v"), np.split(array, 3, axis=0)):
                _assign(params, f"{flax_prefix}/{part}_proj_bias", sub)
            continue
        if rest.startswith(("weight_ih", "weight_hh", "bias_ih", "bias_hh")):
            _assign(params, f"{flax_prefix}/{rest}", array)
            continue
        if rest in ("q_proj_weight", "k_proj_weight", "v_proj_weight"):
            # torch MHA with kdim/vdim != embed_dim keeps the projections
            # unpacked under these exact attribute names; ours use the
            # same names and layout — copy verbatim (no transpose)
            _assign(params, f"{flax_prefix}/{rest}", array)
            continue
        if rest.endswith("out_proj.weight"):
            _assign(params, f"{flax_prefix}/out_proj_weight", array)
            continue
        if rest.endswith("out_proj.bias"):
            _assign(params, f"{flax_prefix}/out_proj_bias", array)
            continue
        if rest.endswith("weight"):
            base = rest[: -len(".weight")].replace(".", "/")
            base = f"{flax_prefix}/{base}" if base else flax_prefix
            if array.ndim == 2:
                _assign(params, f"{base}/kernel", array.T)
            else:  # LayerNorm weight
                _assign(params, f"{base}/scale", array)
            continue
        if rest.endswith("bias"):
            base = rest[: -len(".bias")].replace(".", "/")
            base = f"{flax_prefix}/{base}" if base else flax_prefix
            _assign(params, f"{base}/bias", array)
            continue
    return params


def restore_opt_state(payload: Dict[str, Any], optimizer, params):
    """Rebuild the optax state from saved leaves + a fresh init template.

    The template supplies the pytree structure (optax states include
    NamedTuples that orbax cannot reconstruct on its own); the saved
    leaves supply the values. Returns None if the checkpoint predates
    optimizer-state saving.
    """
    if "opt_leaves" not in payload or payload["opt_leaves"] is None:
        return None
    template = optimizer.init(params)
    treedef = jax.tree_util.tree_structure(template)
    leaves = payload["opt_leaves"]
    if isinstance(leaves, dict):  # orbax restores lists as {index: leaf}
        leaves = [leaves[k] for k in sorted(leaves, key=int)]
    template_leaves = jax.tree_util.tree_leaves(template)
    cast = [
        np.asarray(x).astype(np.asarray(t).dtype).reshape(np.shape(t))
        for x, t in zip(leaves, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)
