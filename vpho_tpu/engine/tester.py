"""TesterHand / TesterObject: metric aggregation + report formatting.

Host-side wrappers around the batched device criteria in ``metrics.py``,
reproducing the reference's report structure (lib/engine/test.py):
  * object: per-YCB-class breakdown skipping '051_large_clamp'
    (test.py:302-319), 'average_instance'/'average_class' reductions and the
    truncating mm/percent formatting (test.py:522-582)
  * hand: right/left/both splits + per-joint MJE breakdown (test.py:585-655)
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ycb import YCBRegistry
from . import metrics as M

DIST_KEYS = ("MCE", "MCE2", "SMCE", "OCE", "ADD", "ADDS", "CD")
RATE_KEYS = ("ADD01d", "ADDS01d", "REP5")


_hand_metrics_jit = jax.jit(M.hand_metrics)


class TesterHand:
    """Accumulates per-batch hand criteria; reports mm tables."""

    def __init__(self):
        self._rows: list[dict] = []

    def add_batch(self, gt_joint, pd_joint, gt_vert, pd_vert, is_right, valid=None):
        out = _hand_metrics_jit(jnp.asarray(gt_joint), jnp.asarray(pd_joint),
                                jnp.asarray(gt_vert), jnp.asarray(pd_vert))
        out = {k: np.asarray(v) for k, v in out.items()}
        out["is_right"] = np.asarray(is_right)
        # keep the mask as a COLUMN (filtered in result()): rows stay
        # fixed-shape so the multi-host allgather can stack them
        n = out["is_right"].shape[0]
        out["_valid"] = (np.ones(n, bool) if valid is None
                         else np.asarray(valid, bool))
        self._rows.append(out)

    def gather_rows(self):
        """Multi-host metric gather: pool per-process host rows before
        reporting — the gather_for_metrics(use_gather_object=True)
        equivalent (train_diff_hand_obj.py:333-335).  Single-process no-op."""
        from ..parallel.mesh import allgather_rows

        self._rows = allgather_rows(self._rows)

    def result(self) -> Dict[str, Dict[str, float]]:
        if not self._rows:
            return {}
        cat = {k: np.concatenate([r[k] for r in self._rows]) for k in self._rows[0]}
        keep = cat.pop("_valid").astype(bool)
        cat = {k: v[keep] for k, v in cat.items()}
        is_right = cat.pop("is_right").astype(bool)
        res: Dict[str, Dict[str, float]] = {}
        splits = {"right": is_right, "left": ~is_right,
                  "both": np.ones_like(is_right)}
        for key in ("MJE", "PA_MJE", "MVE", "PAMVE"):
            res[key] = {s: float(cat[key][m].mean()) if m.any() else float("nan")
                        for s, m in splits.items()}
        for j in range(21):
            res[f"MJE_{j}"] = {
                s: float(cat["JE"][m][:, j].mean()) if m.any() else float("nan")
                for s, m in splits.items()
            }
        return res

    def report_mm(self) -> Dict[str, Dict[str, str]]:
        return {k: {s: f"{1000 * v:.2f}" for s, v in d.items()}
                for k, d in self.result().items()}


class TesterObject:
    """Accumulates per-batch object criteria; per-class + average reports."""

    def __init__(self, registry: YCBRegistry):
        self.registry = registry
        # registry captured in the closure (its ``names`` tuple of strings is
        # not a jax type, so it cannot cross the jit boundary as an argument)
        self._metrics_jit = jax.jit(
            lambda pd, gt, ids, K: M.object_metrics(registry, pd, gt, ids, K))
        self._rows: list[dict] = []

    def add_batch(self, pd_rt, gt_rt, obj_ids, cam_intr, valid=None):
        out = self._metrics_jit(jnp.asarray(pd_rt), jnp.asarray(gt_rt),
                                jnp.asarray(obj_ids), jnp.asarray(cam_intr))
        out = {k: np.asarray(v) for k, v in out.items()}
        out["obj_id"] = np.asarray(obj_ids)
        n = out["obj_id"].shape[0]
        out["_valid"] = (np.ones(n, bool) if valid is None
                         else np.asarray(valid, bool))
        self._rows.append(out)

    def gather_rows(self):
        """Multi-host metric gather: pool per-process host rows before
        reporting — the gather_for_metrics(use_gather_object=True)
        equivalent (train_diff_hand_obj.py:333-335).  Single-process no-op."""
        from ..parallel.mesh import allgather_rows

        self._rows = allgather_rows(self._rows)

    def result(self) -> Dict[str, Dict[str, float]]:
        if not self._rows:
            return {}
        cat = {k: np.concatenate([r[k] for r in self._rows]) for k in self._rows[0]}
        keep = cat.pop("_valid").astype(bool)
        cat = {k: v[keep] for k, v in cat.items()}
        obj_id = cat.pop("obj_id")
        names = self.registry.names
        res: Dict[str, Dict[str, float]] = {}
        for key, vals in cat.items():
            per = {}
            class_vals = []
            for i, name in enumerate(names):
                if name == "051_large_clamp":  # excluded per test.py:303-304
                    continue
                sel = obj_id == i
                if sel.any():
                    per[name] = float(vals[sel].mean())
                    class_vals.append(vals[sel])
            if class_vals:
                allv = np.concatenate(class_vals)
                per["average_class"] = float(allv.mean())
                per["average_instance"] = float(allv.mean())
            else:
                per["average_class"] = per["average_instance"] = float("nan")
            res[key] = per
        return res

    def report(self) -> Dict[str, Dict[str, float]]:
        """Truncating format of test.py:569-582: distances mm, rates percent."""
        out = {}
        for key, per in self.result().items():
            fmt = {}
            for name, v in per.items():
                if not np.isfinite(v):
                    fmt[name] = v
                elif key in DIST_KEYS:
                    fmt[name] = int(v * 100000) / 100          # m -> mm, trunc
                elif key in RATE_KEYS or key.startswith("FSCORE@"):
                    fmt[name] = int(v * 10000) / 100           # -> percent
                elif key == "REP":
                    fmt[name] = int(v * 100) / 100             # pixels
                else:
                    fmt[name] = v
            out[key] = fmt
        return out


def evaluate_prediction_pkl(path: str, registry: YCBRegistry):
    """Re-score a dumped ``my-prediction_align-*.pkl`` (reference allows
    passing a pkl path to the testers, test.py:237-239 / 598-600).

    The dump rows carry pd_obj_rt / gt_obj_rt / obj_id (trainer.evaluate);
    returns the TesterObject report.  Hand re-scoring requires gt hand
    fields, included when the dump was produced by this framework's eval.
    """
    import pickle

    with open(path, "rb") as f:
        rows = pickle.load(f)
    t_obj = TesterObject(registry)
    # camera intrinsics are not part of the reference dump; REP-family
    # criteria are computed with a nominal K (they are reported but marked)
    import numpy as _np

    nominal_k = False
    for r in rows:
        n = r["pd_obj_rt"].shape[0]
        K = _np.tile(_np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]],
                               _np.float32), (n, 1, 1))
        nominal_k = nominal_k or "cam_intr" not in r
        t_obj.add_batch(r["pd_obj_rt"], r["gt_obj_rt"], r["obj_id"], r.get("cam_intr", K))
    report = t_obj.report()
    if nominal_k:
        # mark, don't silently report: REP/REP5 are pixel-space and depend on K
        for key in ("REP", "REP5"):
            if key in report:
                report[f"{key} (nominal-K!)"] = report.pop(key)
    return report
