"""Training/evaluation engine (SPMD data-parallel, optax, orbax checkpoints).

TPU-native replacement for lib/engine/base_trainer.py + train_diff_hand_obj.py:
  * Accelerate/DDP -> one jitted ``train_step`` over a 1-D ``data`` mesh with
    batch-sharded inputs and replicated params (XLA emits the grad psum)
  * grad accumulation -> optax.MultiSteps (base_trainer.py:22 semantics)
  * LR schedules: exp / step / onecycle-cosine, with the per-epoch stepping
    of the reference (the gamma^(1/num_processes) compensation hack at
    train_diff_hand_obj.py:58 is unnecessary here — we step exactly once per
    epoch regardless of device count)
  * checkpoints: orbax, directory names ``epoch_N.state`` for CLI parity
    with ``--checkpoint .../epoch_N.state`` resume (base_trainer.py:26-29)
  * evaluation: jitted predict forward + device-side metric criteria +
    host-side pandas-style reports (train_diff_hand_obj.py:202-357)
"""
from __future__ import annotations

import dataclasses
import datetime
import logging
import os
import pickle
import re
import sys
import time
from functools import partial
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from ..configs.config import Config
from ..data.prefetch import prefetch
from ..models import vpho as V
from ..models.vpho import VPHONet, forward_predict, forward_train
from ..parallel.mesh import make_mesh, pad_batch_to, replicate, shard_batch
from ..utils import transforms as T
from .tester import TesterHand, TesterObject


def setup_logger(save_dir: str, name: str = "vpho") -> logging.Logger:
    """File + console logging (base_trainer.py:52-63)."""
    os.makedirs(save_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(save_dir, "info.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    buffers: Any = None


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """exp / step / cosine(OneCycle) schedules (train_diff_hand_obj.py:56-72).

    exp and step decay per EPOCH; cosine (OneCycle) varies per step with 10%
    warmup, matching torch OneCycleLR(pct_start=0.1, anneal='cos').
    """
    base = cfg.base_learning_rate
    if cfg.scheduler == "exp":
        def sched(step):
            epoch = step // steps_per_epoch
            return base * cfg.gamma**epoch
        return sched
    if cfg.scheduler == "step":
        def sched(step):
            epoch = step // steps_per_epoch
            return base * cfg.gamma ** (epoch // cfg.lr_step)
        return sched
    if cfg.scheduler == "cosine":
        total = cfg.max_epochs * steps_per_epoch
        warm = max(int(total * 0.1), 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=base / 25.0, peak_value=base, warmup_steps=warm,
            decay_steps=total, end_value=base / 1e4,
        )
    raise ValueError(cfg.scheduler)


def make_optimizer(cfg: Config, steps_per_epoch: int):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adamw":
        tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optimizer == "adam":
        # reference uses Adam with weight_decay 5e-4 (train_diff_hand_obj.py:54)
        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(sched))
    else:
        raise ValueError(cfg.optimizer)
    if cfg.gradient_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip), tx)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, sched


def create_train_state(model: VPHONet, ctx: V.VPHOContext, cfg: Config,
                       sample_batch: Dict[str, Any], steps_per_epoch: int,
                       rng: jax.Array) -> TrainState:
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(rngs, sample_batch, False)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
        buffers=variables["buffers"],
    )


def make_train_step(model: VPHONet, ctx: V.VPHOContext):
    """Build the jitted SPMD train step (donates state)."""

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats,
                         "buffers": state.buffers}
            total, loss_dt, mutated = forward_train(model, variables, ctx, batch, rng)
            return total, (loss_dt, mutated)

        (_, (loss_dt, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, loss_dt

    return jax.jit(train_step, donate_argnums=(0,))


def make_predict_step(model: VPHONet, ctx: V.VPHOContext):
    def predict_step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        return forward_predict(model, variables, ctx, batch, rng)

    return jax.jit(predict_step)


def make_candidate_step(model: VPHONet, ctx: V.VPHOContext):
    """Trunk + diffusion hypothesis sampling only — no aggregation.

    Backs ``--mode infer_candidate``.  The reference's dispatch names this
    mode (main.py:12-13) but its Trainer never defines ``infer_candidate``
    (instant AttributeError); this implements the evident intent: dump the
    raw candidate sets for offline aggregation studies.
    """
    from ..models.vpho import forward_candidates

    def candidate_step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        pd_dt, _ = forward_candidates(model, variables, ctx, batch, rng)
        return pd_dt

    return jax.jit(candidate_step)


# ---------------------------------------------------------------------------
# eval postprocess (train_diff_hand_obj.py:578-602)
# ---------------------------------------------------------------------------


def postprocess_obj_rt(pose9d: jax.Array, root_joint: jax.Array) -> jax.Array:
    """Wrist-relative 9D pose -> camera-frame (3, 4) rt."""
    rt = T.obj_9d_to_mat(pose9d)
    shape = rt.shape[:-2]
    root = root_joint.reshape((root_joint.shape[0],) + (1,) * (len(shape) - 1) + (3,))
    return rt.at[..., :, 3].add(jnp.broadcast_to(root, shape + (3,)))


def postprocess_hand_vert(vert: jax.Array, root_joint: jax.Array,
                          is_right: jax.Array) -> jax.Array:
    """Unflip left hands and move from wrist-relative to camera frame."""
    vert = T.flip_point3d(vert, ~is_right)
    root = root_joint.reshape((root_joint.shape[0],) + (1,) * (vert.ndim - 2) + (3,))
    return vert + root


class Trainer:
    """End-to-end runner: train / eval / infer dispatch (main.py parity)."""

    def __init__(self, cfg: Config, dataset=None, eval_dataset=None):
        self.cfg = cfg
        # module-level switch, captured at trace time by every jitted graph
        # (plumbing a static arg through the many aggregation call sites
        # would buy nothing — the choice is global per run)
        T.set_quat_mean_impl(cfg.quat_mean_impl)
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        run_name = f"{stamp}_{cfg.mark}_{cfg.mode}_{cfg.model}"
        self.save_dir = os.path.join(cfg.output_dir, run_name)
        self.logger = setup_logger(self.save_dir)

        self.ctx = V.make_context(cfg.to_model_config(), cfg.mano_root or None,
                                  cfg.models_dir or None)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.model = VPHONet(roi_size=cfg.roi_size, heatmap_size=cfg.heatmap_size,
                             compute_dtype=dtype,
                             cross_attention_axis=cfg.cross_attention_axis)
        self.mesh = make_mesh(cfg.num_devices or None)
        self.dataset = dataset
        self.eval_dataset = eval_dataset
        self.tester_hand_keys = ("regression", "one_candidate", "agg_candidate")
        self.start_epoch = 0
        if cfg.checkpoint:
            m = re.search(r"epoch_(\d+)\.state", cfg.checkpoint)
            if m:
                self.start_epoch = int(m.group(1))

        self._train_step = None
        self._predict_step = None
        self._trace_done = False
        self.state: Optional[TrainState] = None

    # -- state/checkpoint management ------------------------------------

    def init_state(self, sample_batch, steps_per_epoch: int):
        rng = jax.random.PRNGKey(self.cfg.random_seed or 206)
        if "rgb_full" in sample_batch:
            # device-preprocess loader: materialize rgb/heatmaps once so
            # model.init sees the model-facing batch contract
            sample_batch = jax.device_get(
                self._device_preprocess(is_train=True)(sample_batch))
        self.state = create_train_state(
            self.model, self.ctx, self.cfg, sample_batch, steps_per_epoch, rng)
        self._load_initial_weights()
        self.state = replicate(self.state, self.mesh)
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        self.logger.info(f"Model params: {n_params/1e6:.2f}M")
        if self.cfg.checkpoint:
            self.load_checkpoint(self.cfg.checkpoint)

    def _load_initial_weights(self):
        """ImageNet backbone init + --pretrain loading (pre-replication).

        Mirrors the reference: the FPN initializes from torchvision's
        ImageNet resnet50 (backbone_FPN_HFL.py:256-261 — here from a local
        ``asset/resnet50.pth`` since there is no egress), then a full
        --pretrain checkpoint (reference .pth or our .pkl) is applied on top
        with --remove_pretrained_keys prefix filtering
        (train_diff_hand_obj.py:39-46).
        """
        from ..utils import torch_import as TI

        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats,
                     "buffers": self.state.buffers}
        loaded = False
        imagenet = self.cfg.imagenet_pretrain
        if imagenet and os.path.exists(imagenet):
            sd = TI.load_torch_file(imagenet)
            variables = TI.load_resnet50_into_backbone(variables, sd)
            self.logger.info(f"Initialized backbone from {imagenet}")
            loaded = True
        if self.cfg.pretrain:
            variables, report = TI.load_pretrain(
                variables, self.cfg.pretrain,
                tuple(self.cfg.remove_pretrained_keys))
            for k in report["missing"]:
                self.logger.warning(f"pretrain: missing key {k}")
            for k in report["unconsumed"][:20]:
                self.logger.warning(f"pretrain: unconsumed key {k}")
            self.logger.info(
                f"Loaded pretrain {self.cfg.pretrain}: "
                f"{len(report['imported'])} modules imported, "
                f"{len(report['missing'])} missing, "
                f"{len(report['unconsumed'])} unconsumed")
            loaded = True
        if loaded:
            as_jnp = jax.tree.map(jnp.asarray, variables)
            self.state = self.state.replace(
                params=as_jnp["params"], batch_stats=as_jnp["batch_stats"],
                buffers=as_jnp["buffers"])

    def save_checkpoint(self, epoch: int):
        """orbax save to <run>/checkpoint/epoch_N.state (base_trainer.py:85-89)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.save_dir, "checkpoint", f"epoch_{epoch}.state"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(dataclasses.asdict(
            _StatePayload(params=self.state.params,
                          batch_stats=self.state.batch_stats,
                          buffers=self.state.buffers,
                          opt_state=self.state.opt_state,
                          step=self.state.step))))
        ckptr.wait_until_finished()
        self.logger.info(f"Saved checkpoint: {path}")

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = dataclasses.asdict(_StatePayload(
            params=jax.device_get(self.state.params),
            batch_stats=jax.device_get(self.state.batch_stats),
            buffers=jax.device_get(self.state.buffers),
            opt_state=jax.device_get(self.state.opt_state),
            step=jax.device_get(self.state.step)))
        restored = ckptr.restore(os.path.abspath(path), target)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            buffers=restored["buffers"], opt_state=restored["opt_state"],
            step=restored["step"])
        self.state = replicate(self.state, self.mesh)
        self.logger.info(f"Loaded checkpoint: {path}")

    def save_model(self):
        """Final raw params dump (base_trainer.py:91-96)."""
        path = os.path.join(self.save_dir, "final_model.pkl")
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(
                {"params": self.state.params, "batch_stats": self.state.batch_stats,
                 "buffers": self.state.buffers}), f)
        self.logger.info(f"Saved final model: {path}")

    def _device_preprocess(self, is_train: bool):
        """Cached jitted input-preprocess closure, or None when disabled.

        ``--device_preprocess``: the loader ships decoded frames + warp/aug
        params and this graph does crop/color/normalize/erase/heatmaps
        on-device (data/device_pipeline.py).  The closure no-ops on batches
        that already carry ``rgb`` (synthetic fixture stream), so the loops
        apply it unconditionally when the flag is set.
        """
        if not getattr(self.cfg, "device_preprocess", False):
            return None
        key = "train" if is_train else "eval"
        if not hasattr(self, "_dev_pre"):
            self._dev_pre = {}
        if key not in self._dev_pre:
            from ..data.device_pipeline import make_device_preprocess

            self._dev_pre[key] = make_device_preprocess(self.cfg, is_train)
        return self._dev_pre[key]

    # -- loops -----------------------------------------------------------

    def train_one_epoch(self, epoch: int, batches: Iterable[Dict[str, Any]],
                        steps_per_epoch: int):
        if self._train_step is None:
            self._train_step = make_train_step(self.model, self.ctx)
        rng = jax.random.PRNGKey(1000 + epoch)
        t0 = time.time()
        last = {}

        pre = self._device_preprocess(is_train=True)
        counter = iter(range(1 << 30))

        def stage(batch):
            n = next(iter(batch.values())).shape[0]
            if n % self.mesh.size:
                raise ValueError(
                    f"train batch size {n} must be divisible by the "
                    f"{self.mesh.size}-device mesh (set --batch_size or "
                    f"--num_devices accordingly)")
            sharded = shard_batch(batch, self.mesh)
            if pre is not None:
                # fused on-device crop/aug/heatmaps; dispatched from the
                # prefetch thread so it overlaps the running step.  Keys
                # live in their own fold-in domain (0x5A5A tag) so the
                # erase-noise stream can never collide with the train
                # step's fold_in(rng, state.step) stream
                k = jax.random.fold_in(jax.random.fold_in(rng, 0x5A5A),
                                       next(counter))
                sharded = pre(sharded, k)
            return sharded

        # double-buffered input: batch i+1 is assembled + device_put while
        # step i runs (DataLoader-workers/pin_memory equivalent)
        for i, batch in enumerate(prefetch(batches, stage)):
            self.state, loss_dt = self._train_step(self.state, batch, rng)
            last = loss_dt
            if i % max(self.cfg.print_freq, 1) == 0:
                loss_host = {k: float(v) for k, v in jax.device_get(loss_dt).items()}
                msg = f"[{i:04d}/{steps_per_epoch}] " + " ".join(
                    f"{k.replace('_loss', '')}:{v:.2e}" for k, v in loss_host.items())
                self.logger.info(msg)
        dt = time.time() - t0
        self.logger.info(f"Epoch {epoch} done in {dt:.1f}s")
        return last

    def evaluate(self, batches: Iterable[Dict[str, Any]],
                 path_of=None) -> Dict[str, Any]:
        """Predict + metric suite over an eval stream.

        Each host batch must carry gt_joint/gt_hand_vert (camera frame),
        gt_obj_rt (3,4), cam_intr, obj_id in addition to the model inputs.
        Host-side keys: ``_valid`` masks padded tail samples out of the
        metrics AND the collector (lossless eval — no test frame dropped, no
        padding scored); ``_index`` + ``path_of`` fill the collector's
        index/path columns (pkl parity, train_diff_hand_obj.py:443-444).
        """
        path_of = path_of or (getattr(self.eval_dataset, "get_path", None)
                              if self.eval_dataset is not None else None)
        if self._predict_step is None:
            self._predict_step = make_predict_step(self.model, self.ctx)
        rng = jax.random.PRNGKey(128)

        testers_hand = {k: TesterHand() for k in self.tester_hand_keys}
        testers_obj = {k: TesterObject(self.ctx.registry)
                       for k in ("one_candidate", "mean_candidate_pose")}
        collector_res = []

        pre = self._device_preprocess(is_train=False)

        def stage(batch):
            valid = batch.pop("_valid", None)
            index = batch.pop("_index", None)
            # eval batches must divide the mesh; pad + mask (lossless)
            n = next(iter(batch.values())).shape[0]
            m = self.mesh.size
            if n % m:
                target = -(-n // m) * m
                batch, pad_valid = pad_batch_to(batch, target)
                valid = pad_valid if valid is None else np.concatenate(
                    [np.asarray(valid), np.zeros(target - n, bool)])
                if index is not None:
                    index = np.concatenate(
                        [np.asarray(index), np.full(target - n, -1)])
            sharded = shard_batch(batch, self.mesh)
            if pre is not None:
                sharded = pre(sharded)
            return sharded, valid, index

        for i, (jbatch, valid, index) in enumerate(prefetch(batches, stage)):
            if i == 0:
                # FLOPs/params at eval batch 0 (train_diff_hand_obj.py:220-221)
                try:
                    from .profiling import flops_of, param_count

                    cost = flops_of(self._predict_step, self.state, jbatch,
                                    jax.random.fold_in(rng, 0))
                    self.logger.info(
                        f"predict graph: {cost['flops']/1e9:.2f} GFLOPs, "
                        f"{param_count(self.state.params)/1e6:.2f}M params")
                except Exception as e:  # cost analysis is best-effort
                    self.logger.info(f"flops analysis unavailable: {e}")
            if (i == 1 and getattr(self.cfg, "trace_dir", "")
                    and not self._trace_done):
                # one post-warmup xprof trace of a steady-state eval batch
                # (--trace_dir; view with TensorBoard / xprof).  Captured at
                # most once per Trainer lifetime, not once per evaluate().
                from .profiling import trace

                try:
                    with trace(self.cfg.trace_dir):
                        pd = self._predict_step(
                            self.state, jbatch, jax.random.fold_in(rng, i))
                        jax.block_until_ready(pd)
                    # only mark done on SUCCESS: a transient failure (e.g.
                    # trace dir not yet writable) retries on the next
                    # evaluate() instead of silently never capturing
                    self._trace_done = True
                    self.logger.info(f"xprof trace written: {self.cfg.trace_dir}")
                except Exception as e:  # tracing is best-effort
                    self.logger.warning(
                        f"xprof trace failed ({e}); will retry at the next "
                        f"evaluate()")
                    pd = self._predict_step(
                        self.state, jbatch, jax.random.fold_in(rng, i))
            else:
                pd = self._predict_step(
                    self.state, jbatch, jax.random.fold_in(rng, i))

            root = jbatch["root_joint"]
            is_right = jbatch["is_right"]
            # to camera frame / original chirality
            pd_vert_reg = postprocess_hand_vert(pd["reg_hand_vert"], root, is_right)
            pd_joint_reg = postprocess_hand_vert(pd["reg_hand_joint"], root, is_right)
            pd_vert_agg = postprocess_hand_vert(pd["agg_hand_vert"], root, is_right)
            pd_joint_agg = postprocess_hand_vert(pd["agg_hand_joint"], root, is_right)
            pd_vert_one = postprocess_hand_vert(
                pd["diff_final_hand_vert"][:, 0], root, is_right)
            pd_joint_one = postprocess_hand_vert(
                pd["diff_final_hand_joint"][:, 0], root, is_right)
            pd_rt_one = postprocess_obj_rt(pd["diff_final_obj_6d"][:, 0], root)
            pd_rt_agg = postprocess_obj_rt(pd["agg_obj_6d"], root)

            # multi-host: every host feeds the same global batch, so each
            # process extracts only the rows IT owns before scoring — no
            # sample is counted process_count times and no non-addressable
            # array is fetched (single host: identity).
            from ..parallel.mesh import host_local_indices, host_local_rows as L

            n_rows = int(pd_rt_agg.shape[0])
            own = host_local_indices(pd_rt_agg, n_rows)
            valid_own = (np.asarray(valid)[own] if valid is not None
                         else np.ones(own.shape[0], bool))
            index_own = (np.asarray(index)[own] if index is not None
                         else np.full(own.shape[0], -1))

            gt_joint = L(jbatch["gt_joint"])
            gt_vert = L(jbatch["gt_hand_vert"])
            is_right_l = L(is_right)
            gt_rt_l = L(jbatch["gt_obj_rt"])
            obj_id_l = L(jbatch["obj_id"])
            cam_l = L(jbatch["cam_intr"])
            pd_vert_agg_l = L(pd_vert_agg)
            pd_joint_agg_l = L(pd_joint_agg)
            pd_rt_agg_l = L(pd_rt_agg)
            testers_hand["regression"].add_batch(
                gt_joint, L(pd_joint_reg), gt_vert, L(pd_vert_reg), is_right_l, valid_own)
            testers_hand["one_candidate"].add_batch(
                gt_joint, L(pd_joint_one), gt_vert, L(pd_vert_one), is_right_l, valid_own)
            testers_hand["agg_candidate"].add_batch(
                gt_joint, pd_joint_agg_l, gt_vert, pd_vert_agg_l, is_right_l, valid_own)
            testers_obj["one_candidate"].add_batch(
                L(pd_rt_one), gt_rt_l, obj_id_l, cam_l, valid_own)
            testers_obj["mean_candidate_pose"].add_batch(
                pd_rt_agg_l, gt_rt_l, obj_id_l, cam_l, valid_own)

            # collector rows stay UNFILTERED (+_valid/_index columns) so the
            # multi-host gather sees equal shapes; filtered + path-attached
            # after the gather below
            collector_res.append({
                "pd_obj_rt": pd_rt_agg_l,
                "pd_hand_vert": pd_vert_agg_l.astype(np.float16),
                "pd_hand_joint": pd_joint_agg_l,
                "gt_obj_rt": gt_rt_l,
                "obj_id": obj_id_l,
                "_valid": valid_own,
                "_index": index_own,
            })

            if self.cfg.viz_freq > 0 and i % self.cfg.viz_freq == 0:
                # Batch3D pkl dumps (train_diff_hand_obj.py:272-329)
                from . import viz

                try:
                    obj_id0 = int(np.asarray(jbatch["obj_id"])[0])
                    gt_obj_vert0 = np.asarray(
                        self.ctx.registry.verts_sampled[obj_id0])
                    gt_rt0 = np.asarray(jbatch["gt_obj_rt"][0])
                    viz.save_viz_hand(
                        self.save_dir, i,
                        gt_vert=np.asarray(gt_vert[0]),
                        gt_obj_vert=gt_obj_vert0 @ gt_rt0[:, :3].T + gt_rt0[:, 3],
                        pd_vert_reg=np.asarray(pd_vert_reg[0]),
                        pd_vert_diff=np.asarray(postprocess_hand_vert(
                            pd["diff_final_hand_vert"], root, is_right)[0]),
                        pd_vert_agg=np.asarray(pd_vert_agg[0]))
                    viz.save_viz_obj(
                        self.save_dir, i, self.ctx.registry, obj_id0,
                        gt_rt=gt_rt0,
                        pd_rt_cands=np.asarray(postprocess_obj_rt(
                            pd["diff_final_obj_6d"], root)[0]),
                        pd_rt_agg=np.asarray(pd_rt_agg[0]),
                        gt_hand=np.asarray(gt_vert[0]))
                    # heatmap JPG grids + force pkl (reference evaluate
                    # calls both every viz_freq batch, :300-329)
                    viz.save_viz_heatmap(
                        self.save_dir, i,
                        rgb_norm=np.asarray(jbatch["rgb"][0]),
                        bbox_hand=np.asarray(jbatch["bbox_hand"][0]),
                        bbox_obj=np.asarray(jbatch["bbox_obj"][0]),
                        pd_hm_hand=np.asarray(pd["hand_heatmap"][0]),
                        gt_hm_hand=np.asarray(jbatch["hm_hand"][0])
                        if "hm_hand" in jbatch else np.asarray(pd["hand_heatmap"][0]),
                        pd_hm_obj=np.asarray(pd["obj_heatmap"][0]),
                        gt_hm_obj=np.asarray(jbatch["hm_obj"][0])
                        if "hm_obj" in jbatch else np.asarray(pd["obj_heatmap"][0]))
                    # segmentation viz only when a model emits obj_segm —
                    # same gate as the reference (:310-314); vpho_net
                    # never does, so this is normally dormant
                    if "obj_segm" in pd and "segm_obj" in jbatch:
                        viz.save_viz_segmentation(
                            self.save_dir, i,
                            rgb_norm=np.asarray(jbatch["rgb"][0]),
                            bbox_obj=np.asarray(jbatch["bbox_obj"][0]),
                            pd_obj_segm=np.asarray(pd["obj_segm"][0, 0]),
                            gt_obj_segm=np.asarray(jbatch["segm_obj"][0, 0]))
                    from ..models import anchor as anchor_lib

                    # anchor frames are defined on the FLIPPED (right-hand)
                    # mesh — the frame every other force_local_to_global
                    # call uses (forward_train, hoi_aggregate); feeding the
                    # unflipped camera-frame verts would mirror the anchors
                    # for left hands (reference computes on flipped verts
                    # too and unflips afterwards, :741-760)
                    vert_flip0 = (pd["agg_hand_vert"][:1]
                                  + jbatch["root_joint_flip"][:1, None])
                    fp, fg = anchor_lib.force_local_to_global(
                        self.ctx.anchor_tables, pd["force_local"][:1],
                        vert_flip0)
                    rt_np = np.asarray(pd_rt_agg[0])
                    viz.save_viz_force(
                        self.save_dir, i,
                        vert=np.asarray(vert_flip0[0]),
                        force_point=np.asarray(fp[0]),
                        force_global=np.asarray(fg[0]),
                        gravity=np.asarray(jbatch["gravity"][0]),
                        com=np.asarray(self.ctx.registry.com[obj_id0])[None]
                        @ rt_np[:, :3].T + rt_np[:, 3],
                        obj_mesh=gt_obj_vert0 @ rt_np[:, :3].T + rt_np[:, 3])
                except Exception as e:  # viz must never break eval
                    self.logger.warning(f"viz dump failed: {e}")

        if getattr(self.cfg, "trace_dir", "") and not self._trace_done:
            self.logger.warning(
                "--trace_dir set but no trace captured: the capture runs on "
                "the second (post-warmup) eval batch and this stream had "
                "fewer than 2 batches")

        # multi-host: pool every process's rows before reporting
        # (gather_for_metrics equivalent); single-process no-op
        from ..parallel.mesh import allgather_rows

        for t in list(testers_hand.values()) + list(testers_obj.values()):
            t.gather_rows()
        collector_res = allgather_rows(collector_res)
        # filter padding + attach paths AFTER the gather (string paths
        # cannot cross hosts; they reconstruct from the _index column)
        filtered = []
        for r in collector_res:
            keep = np.asarray(r.pop("_valid"), bool)
            idx = np.asarray(r.pop("_index"))[keep]
            row = {k: np.asarray(v)[keep] for k, v in r.items()}
            if (idx >= 0).all():
                row["index"] = idx
                if path_of is not None:
                    row["path"] = [path_of(int(j)) for j in idx]
            filtered.append(row)
        collector_res = filtered
        report = {
            "hand": {k: t.report_mm() for k, t in testers_hand.items()},
            "object": {k: t.report() for k, t in testers_obj.items()},
        }
        for group, per in report.items():
            for variant, table in per.items():
                self.logger.info(f"{group}/{variant}:")
                try:
                    import pandas as pd

                    self.logger.info("\n" + pd.DataFrame(table).T.to_string())
                except Exception:
                    self.logger.info(str(table))
        return {"report": report, "collector_res": collector_res}

    def dump_predictions(self, collector_res, tag: str = ""):
        """my-prediction pkl dump (train_diff_hand_obj.py:443-444)."""
        path = os.path.join(
            self.save_dir, f"my-prediction_align-{self.cfg.clean_data_mode}{tag}.pkl")
        with open(path, "wb") as f:
            pickle.dump(collector_res, f)
        self.logger.info(f"Dumped predictions: {path}")

    def infer_candidates(self, batches: Iterable[Dict[str, Any]],
                         path_of=None) -> str:
        """``--mode infer_candidate``: dump raw hypothesis sets, no aggregation.

        The reference dispatches this mode (main.py:12-13) to a Trainer
        method that does not exist (AttributeError on arrival); this is the
        evident intent, implemented: per test frame, the S diffusion
        candidates (hand MANO 58-d, object 9-d), the regression candidate,
        and the physics cue — everything an offline aggregation study needs,
        at fp16 where bulky.  Returns the pkl path.
        """
        path_of = path_of or (getattr(self.eval_dataset, "get_path", None)
                              if self.eval_dataset is not None else None)
        step = make_candidate_step(self.model, self.ctx)
        rng = jax.random.PRNGKey(128)
        from ..parallel.mesh import (allgather_rows, host_local_indices,
                                     host_local_rows as L)

        rows = []
        for i, batch in enumerate(batches):
            valid = batch.pop("_valid", None)
            index = batch.pop("_index", None)
            n = next(iter(batch.values())).shape[0]
            m = self.mesh.size
            if n % m:
                target = -(-n // m) * m
                batch, pad_valid = pad_batch_to(batch, target)
                valid = pad_valid if valid is None else np.concatenate(
                    [np.asarray(valid), np.zeros(target - n, bool)])
                if index is not None:
                    index = np.concatenate(
                        [np.asarray(index), np.full(target - n, -1)])
            jbatch = shard_batch(batch, self.mesh)
            pre = self._device_preprocess(is_train=False)
            if pre is not None:
                jbatch = pre(jbatch)
            pd = step(self.state, jbatch, jax.random.fold_in(rng, i))
            n_rows = int(pd["diff_final_obj_6d"].shape[0])
            own = host_local_indices(pd["diff_final_obj_6d"], n_rows)
            rows.append({
                "diff_hand_mano": np.asarray(L(pd["diff_final_hand_mano"]),
                                             np.float16),
                "diff_obj_6d": np.asarray(L(pd["diff_final_obj_6d"]),
                                          np.float32),
                "reg_hand_joint": np.asarray(L(pd["reg_hand_joint"]),
                                             np.float16),
                "force_local": np.asarray(L(pd["force_local"]), np.float16),
                "is_grasped": np.asarray(L(jbatch["is_grasped"])),
                "obj_id": np.asarray(L(jbatch["obj_id"])),
                "_valid": (np.asarray(valid)[own] if valid is not None
                           else np.ones(own.shape[0], bool)),
                "_index": (np.asarray(index)[own] if index is not None
                           else np.full(own.shape[0], -1)),
            })
        rows = allgather_rows(rows)
        filtered = []
        for r in rows:
            keep = np.asarray(r.pop("_valid"), bool)
            idx = np.asarray(r.pop("_index"))[keep]
            row = {k: np.asarray(v)[keep] for k, v in r.items()}
            if (idx >= 0).all():
                row["index"] = idx
                if path_of is not None:
                    row["path"] = [path_of(int(j)) for j in idx]
            filtered.append(row)
        path = os.path.join(
            self.save_dir,
            f"my-candidates_align-{self.cfg.clean_data_mode}.pkl")
        with open(path, "wb") as f:
            pickle.dump(filtered, f)
        self.logger.info(f"Dumped candidates: {path}")
        return path

    def infer_ho3d(self, batches: Iterable[Dict[str, Any]], path_of=None,
                   epoch_tag: str = "") -> Dict[str, Any]:
        """HO3D codalab inference (Trainer.infer, train_diff_hand_obj.py:
        360-444): the evaluation split has NO hand GT, so only object
        metrics are computed (pose annotations exist); hand predictions are
        rotated back to the OpenGL frame and dumped as TWO codalab zips —
        ``<save_dir>/submit/<tag>hand_reg.zip`` (regression branch) and
        ``<tag>hand_diff.zip`` (aggregated diffusion branch) — in the
        evaluation.txt frame order, plus the my-prediction pkl."""
        from ..data.ho3d import OPENGL_TO_OPENCV, dump_codalab
        from ..parallel.mesh import (allgather_rows, host_local_indices,
                                     host_local_rows as L)

        path_of = path_of or (getattr(self.eval_dataset, "get_path", None)
                              if self.eval_dataset is not None else None)
        if self._predict_step is None:
            self._predict_step = make_predict_step(self.model, self.ctx)
        rng = jax.random.PRNGKey(128)
        testers_obj = {k: TesterObject(self.ctx.registry)
                       for k in ("one_candidate", "mean_candidate_pose")}
        GL = np.asarray(OPENGL_TO_OPENCV, np.float32)

        rows = []
        for i, batch in enumerate(batches):
            valid = batch.pop("_valid", None)
            index = batch.pop("_index", None)
            n = next(iter(batch.values())).shape[0]
            m = self.mesh.size
            if n % m:
                target = -(-n // m) * m
                batch, pad_valid = pad_batch_to(batch, target)
                valid = pad_valid if valid is None else np.concatenate(
                    [np.asarray(valid), np.zeros(target - n, bool)])
                if index is not None:
                    index = np.concatenate(
                        [np.asarray(index), np.full(target - n, -1)])
            jbatch = shard_batch(batch, self.mesh)
            pre = self._device_preprocess(is_train=False)
            if pre is not None:
                jbatch = pre(jbatch)
            pd = self._predict_step(self.state, jbatch, jax.random.fold_in(rng, i))

            root = jbatch["root_joint"]
            is_right = jbatch["is_right"]
            pd_vert_reg = postprocess_hand_vert(pd["reg_hand_vert"], root, is_right)
            pd_joint_reg = postprocess_hand_vert(pd["reg_hand_joint"], root, is_right)
            pd_vert_agg = postprocess_hand_vert(pd["agg_hand_vert"], root, is_right)
            pd_joint_agg = postprocess_hand_vert(pd["agg_hand_joint"], root, is_right)
            pd_rt_one = postprocess_obj_rt(pd["diff_final_obj_6d"][:, 0], root)
            pd_rt_agg = postprocess_obj_rt(pd["agg_obj_6d"], root)

            n_rows = int(pd_rt_agg.shape[0])
            own = host_local_indices(pd_rt_agg, n_rows)
            valid_own = (np.asarray(valid)[own] if valid is not None
                         else np.ones(own.shape[0], bool))
            index_own = (np.asarray(index)[own] if index is not None
                         else np.full(own.shape[0], -1))
            gt_rt_l = L(jbatch["gt_obj_rt"])
            obj_id_l = L(jbatch["obj_id"])
            cam_l = L(jbatch["cam_intr"])
            testers_obj["one_candidate"].add_batch(
                L(pd_rt_one), gt_rt_l, obj_id_l, cam_l, valid_own)
            testers_obj["mean_candidate_pose"].add_batch(
                L(pd_rt_agg), gt_rt_l, obj_id_l, cam_l, valid_own)
            rows.append({
                "pd_obj_rt": L(pd_rt_agg),
                "pd_hand_vert": np.asarray(L(pd_vert_agg), np.float16),
                "pd_hand_joint": np.asarray(L(pd_joint_agg)),
                # codalab wants the OpenGL frame back (:387-391)
                "joint_reg_gl": np.asarray(L(pd_joint_reg)) @ GL,
                "vert_reg_gl": np.asarray(L(pd_vert_reg), np.float32) @ GL,
                "joint_diff_gl": np.asarray(L(pd_joint_agg)) @ GL,
                "vert_diff_gl": np.asarray(L(pd_vert_agg), np.float32) @ GL,
                "_valid": valid_own,
                "_index": index_own,
            })

        for t in testers_obj.values():
            t.gather_rows()
        rows = allgather_rows(rows)
        filtered = []
        for r in rows:
            keep = np.asarray(r.pop("_valid"), bool)
            idx = np.asarray(r.pop("_index"))[keep]
            row = {k: np.asarray(v)[keep] for k, v in r.items()}
            row["index"] = idx
            if (idx >= 0).all() and path_of is not None:
                row["path"] = [path_of(int(j)) for j in idx]
            filtered.append(row)

        # codalab lists in dataset (evaluation.txt) order (:421-428)
        order_idx = np.concatenate([r["index"] for r in filtered])
        order = np.argsort(order_idx, kind="stable")

        def cat(key):
            return np.concatenate([r[key] for r in filtered], axis=0)[order]

        submit = os.path.join(self.save_dir, "submit")
        zips = {
            "hand_reg": dump_codalab(
                cat("joint_reg_gl"), cat("vert_reg_gl"),
                os.path.join(submit, f"{epoch_tag}hand_reg")),
            "hand_diff": dump_codalab(
                cat("joint_diff_gl"), cat("vert_diff_gl"),
                os.path.join(submit, f"{epoch_tag}hand_diff")),
        }
        for name, p in zips.items():
            self.logger.info(f"codalab {name}: {p}")

        report = {k: t.report() for k, t in testers_obj.items()}
        for variant, table in report.items():
            self.logger.info(f"object/{variant}:")
            try:
                import pandas as pd_

                self.logger.info("\n" + pd_.DataFrame(table).T.to_string())
            except Exception:
                self.logger.info(str(table))
        keep_keys = ["pd_obj_rt", "pd_hand_vert", "pd_hand_joint", "index", "path"]
        collector_res = [{k: r[k] for k in keep_keys if k in r} for r in filtered]
        self.dump_predictions(collector_res, tag=f"-infer{epoch_tag}")
        return {"report": {"object": report}, "collector_res": collector_res,
                "zips": zips}


@dataclasses.dataclass
class _StatePayload:
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    step: Any
