"""vpho_net: top-level model composition + train/predict orchestration.

TPU-native re-architecture of lib/model/VPHO.py.  The split of concerns:

  * ``VPHONet`` (Flax) holds every TRAINABLE part: dual-stream FPN, heatmap
    heads, encoders, MANO regression head, cross modules, physics head, and
    the two denoisers.  All convs are NHWC; heatmaps cross the module
    boundary as (B, J, H, W) to match the aggregation/loss interfaces.
  * ``VPHOContext`` carries the non-trainable constants (MANO blend model,
    YCB registry, CPF anchor tables, SDE bundle, config).
  * ``forward_train`` / ``forward_predict`` are pure functions gluing the
    trunk to the jitted diffusion sampler and the functional aggregator —
    the entire predict path (trunk -> 2 ODE scans over bs x sample_num
    hypotheses -> 5-stage HOI aggregation) is ONE XLA graph with zero host
    sync, versus the reference's per-RHS-eval GPU<->CPU round trips
    (score_based_model.py:65-92).

Batch dict keys follow the reference dataset contract (dexycb6.py:471-508);
see vpho_tpu/data for the producer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..diffusion.sampler import ode_sampler, score_matching_loss
from ..diffusion.sde import SDE, init_sde
from ..ops.image import resample_rectilinear, resize_bilinear, roi_align
from ..utils import transforms as T
from ..utils.hand import get_joint_aligned_with_ho3d
from . import aggregation as agg
from . import anchor as anchor_lib
from . import heads
from .backbone import FPNBackbone
from .denoiser import Denoiser
from .layers import Encoder, HeadHeatmap, joints_mse_loss
from .mano import MANOModel, hand_verts_meters, load_mano
from .ycb import YCBRegistry, load_registry

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture/eval knobs (subset of the full CLI Config)."""

    roi_size: int = 32
    heatmap_size: int = 64
    patch_size: int = 256
    sde_mode: str = "ve"
    repeat_num: int = 20
    sampling_steps: int = 50
    sample_T0: float = 0.65
    sample_num: int = 50
    topk_hand: int = 15
    topk_obj: int = 5
    # dpm3m by default: DPM-Solver++(3M) multistep, ONE score eval/step
    # (vs heun's 2, rk4's 4) at 3rd order — same cost as dpm2m (identical
    # eval count; measured 874.9 vs 856.3 f/s/chip, within host swing) with
    # a tighter track of the true probability-flow ODE, and still MORE
    # faithful than the reference's adaptive RK45 at the blessed 50-step
    # budget (tests/test_torch_parity.py study: dpm3m err 0.0314, dpm2m
    # 0.0358, heun 0.0360, rk4 0.011, reference RK45 0.046; bf16 variants
    # 0.0374/0.0375/0.0381).  Reduced-step grids (25/32) fail the 1.2x
    # fidelity band at EVERY order — eval count stays at the blessed 50.
    # --ode_method dpm2m/heun/rk4/euler restore the other integrators.
    ode_method: str = "dpm3m"
    # grid spacing: 'uniform' (reference t_eval) or 'karras' (sigma-rho).
    # Studied and NOT promoted: for the VE SDE uniform-t is already
    # geometric in sigma, so karras buys nothing (docs/PERF.md r3)
    ode_schedule: str = "uniform"
    compute_dtype: str = "float32"  # "bfloat16" for the bf16 trunk policy
    # aggregation CLI surface (args.py:233-246; the reference parses these but
    # its live path hardcodes the defaults — here they are live)
    aggregation_mode_hand: str = "heatmap_cascade"
    aggregation_mode_obj: str = "heatmap_cascade"
    do_weighted_average: bool = True
    do_physics_selection: bool = True
    use_regression_as_candidate: bool = True
    # loss weights (argparse defaults, lib/configs/args.py:202-223)
    weight_diff_hand_loss: float = 1.0
    weight_diff_obj_loss: float = 1.0
    weight_hm_hand_loss: float = 1e3
    weight_hm_obj_loss: float = 1e3
    weight_vert_loss: float = 1e4
    weight_joint_loss: float = 1e4
    weight_mano_pose_loss: float = 10.0
    weight_mano_shape_loss: float = 1.0
    weight_force_loss: float = 1.0
    weight_gravity_loss: float = 1.0
    weight_torque_loss: float = 30.0
    weight_supervised_loss: float = 10.0
    weight_CoM_loss: float = 1e2


class VPHOContext(NamedTuple):
    mano: MANOModel
    registry: YCBRegistry
    anchor_tables: anchor_lib.ForceAnchorTables
    sde: SDE
    cfg: ModelConfig


def make_context(cfg: ModelConfig | None = None, mano_root: str | None = None,
                 models_dir: str | None = None) -> VPHOContext:
    cfg = cfg or ModelConfig()
    mano = load_mano(mano_root)
    return VPHOContext(
        mano=mano,
        registry=load_registry(models_dir),
        anchor_tables=anchor_lib.load_anchor_tables(mano),
        sde=init_sde(cfg.sde_mode),
        cfg=cfg,
    )


class VPHONet(nn.Module):
    """All trainable modules of vpho_net (VPHO.py:48-88).

    ``compute_dtype``: None (f32) or e.g. jnp.bfloat16 for the conv trunk /
    encoder / cross-module / denoiser matmuls.  Params stay f32; every
    module casts back to f32 at interface boundaries (heatmap logits,
    encodings feeding geometry, scores feeding the ODE).
    """

    roi_size: int = 32
    heatmap_size: int = 64
    compute_dtype: Any = None
    # "batch" replicates the reference's batch-axis attention for faithful
    # reference-checkpoint inference (DEVIATIONS.md D1)
    cross_attention_axis: str = "tokens"

    def setup(self):
        d = self.compute_dtype
        self.feature_extractor = FPNBackbone(dtype=d)
        self.head_hm_hand = HeadHeatmap(21, dtype=d)
        self.head_hm_obj = HeadHeatmap(27, dtype=d)
        self.encoder_hand = Encoder(256, dtype=d)
        self.encoder_obj = Encoder(256, dtype=d)
        self.head_mano = heads.HeadMano()
        self.cross_hand = heads.CrossModule(
            hid_dim=512, dtype=d, attention_axis=self.cross_attention_axis)
        self.cross_obj = heads.CrossModule(
            hid_dim=512, dtype=d, attention_axis=self.cross_attention_axis)
        self.head_physics = heads.HeadPhysics(hid_dim=512)
        self.denoiser_hand = Denoiser(head="mano_pose", dtype=d)
        self.denoiser_obj = Denoiser(head="obj", dtype=d)

    def align_hm_to_bbox_rectangle(self, hm: Array, bbox: Array, bbox_rect: Array) -> Array:
        """Resample a tight-bbox heatmap onto the rectangular-bbox frame
        (VPHO.py:333-346; MJE 10.87 -> 10.26 per the reference note).

        hm: (B, J, H, W).  Deviation: the reference's ij-order meshgrid makes
        its grid x-coordinate follow the ROW index (a torch meshgrid quirk);
        we build the geometrically-correct grid (x follows columns).
        """
        B = hm.shape[0]
        S = self.heatmap_size
        coords = (jnp.arange(S, dtype=hm.dtype) / (S - 1)) * 2.0 - 1.0
        rel = (bbox_rect[:, 2:] - bbox_rect[:, :2]) / (bbox[:, 2:] - bbox[:, :2])
        # the grid is rectilinear (rows share y, columns share x), so the
        # resample factorizes into two dense tent contractions — no gathers
        gx = coords[None] * rel[:, 0, None]                      # (B, S)
        gy = coords[None] * rel[:, 1, None]
        xs = ((gx + 1.0) * S - 1.0) / 2.0                        # align_corners=False
        ys = ((gy + 1.0) * S - 1.0) / 2.0
        return resample_rectilinear(hm, xs, ys)

    def trunk(self, data: Dict[str, Array], train: bool = False) -> Dict[str, Array]:
        """Shared visual trunk (VPHO.py:112-172).

        data: rgb (B, H, W, 3) NHWC normalized; bbox_* (B, 4) in crop coords;
        is_right (B,) bool; gravity (B, 1, 3); obj_CoM (B, 1, 3).
        """
        rgb = data["rgb"]
        B = rgb.shape[0]
        hand_feat, obj_feat = self.feature_extractor(rgb, train=train)  # NHWC stride 4

        rs = self.roi_size
        hf_hr = roi_align(hand_feat, data["bbox_hand"], rs)
        # NOTE: the reference also crops the tight object bbox (of_or,
        # VPHO.py:126) but only reads its SHAPE; we skip the dead roi_align
        hf_hr_rect = roi_align(hand_feat, data["bbox_hand_rect"], rs)
        of_or_rect = roi_align(obj_feat, data["bbox_obj_rect"], rs)

        # heatmaps: hand from the tight crop, object from the rect crop
        # (VPHO.py:131-132); NHWC -> (B, J, H, W) at the boundary
        pd_hm_hand = jnp.transpose(self.head_hm_hand(hf_hr, train=train), (0, 3, 1, 2))
        pd_hm_obj = jnp.transpose(self.head_hm_obj(of_or_rect, train=train), (0, 3, 1, 2))

        pd_hm_hand_rect = self.align_hm_to_bbox_rectangle(
            pd_hm_hand, data["bbox_hand"], data["bbox_hand_rect"])
        pd_hm_obj_rect = self.align_hm_to_bbox_rectangle(
            pd_hm_obj, data["bbox_obj"], data["bbox_obj_rect"])

        # flip object features/heatmaps back to original chirality for left
        # hands (VPHO.py:137-139): flip along the width axis
        flip = (~data["is_right"])[:, None, None, None]
        of_or_rect = jnp.where(flip, of_or_rect[:, :, ::-1, :], of_or_rect)
        pd_hm_obj_rect_ori = jnp.where(flip, pd_hm_obj_rect[..., ::-1], pd_hm_obj_rect)

        # squeeze heatmaps to roi size and concat as encoder input channels
        pd_hm_hand_rs = resize_bilinear(pd_hm_hand_rect, (rs, rs))
        pd_hm_obj_rs = resize_bilinear(pd_hm_obj_rect_ori, (rs, rs))
        enc_in_hand = jnp.concatenate(
            [hf_hr_rect, jnp.transpose(pd_hm_hand_rs, (0, 2, 3, 1))], axis=-1)
        enc_in_obj = jnp.concatenate(
            [of_or_rect, jnp.transpose(pd_hm_obj_rs, (0, 2, 3, 1))], axis=-1)
        encoding_hand, enc_hand_ls = self.encoder_hand(enc_in_hand, train=train)  # (B, 1024)
        encoding_obj, enc_obj_ls = self.encoder_obj(enc_in_obj, train=train)
        encoding_hand = encoding_hand.astype(jnp.float32)
        encoding_obj = encoding_obj.astype(jnp.float32)
        enc_hand_ls = [e.astype(jnp.float32) for e in enc_hand_ls]
        enc_obj_ls = [e.astype(jnp.float32) for e in enc_obj_ls]

        pd_mano_pose, pd_mano_shape = self.head_mano(encoding_hand)

        gravity_f = T.flip_point3d(data["gravity"], ~data["is_right"])
        obj_com_f = T.flip_point3d(data["obj_CoM"], ~data["is_right"])

        enc_phy_hand, _, _ = self.cross_hand(
            enc_hand_ls[1], jax.lax.stop_gradient(enc_obj_ls[1]), gravity_f, train=train)
        _, enc_phy_obj, _ = self.cross_obj(
            jax.lax.stop_gradient(enc_hand_ls[1]), enc_obj_ls[1], gravity_f, train=train)
        pd_phy_dt = self.head_physics(enc_phy_hand, enc_phy_obj)

        return {
            "encoding_hand": encoding_hand,
            "encoding_obj": encoding_obj,
            "pd_hm_hand": pd_hm_hand,
            "pd_hm_obj": pd_hm_obj,
            "pd_mano_pose": pd_mano_pose,
            "pd_mano_shape": pd_mano_shape,
            "pd_phy": pd_phy_dt,
            "gravity_flipped": gravity_f,
            "obj_CoM_flipped": obj_com_f,
        }

    def denoise_hand(self, feat, x, t, std):
        return self.denoiser_hand(feat, x, t, std)

    def denoise_obj(self, feat, x, t, std):
        return self.denoiser_obj(feat, x, t, std)

    # fast ODE-loop path: the conditioning-feature projection (73% of the
    # head FLOPs) is constant across all score evaluations — precompute it
    # once per sample and reuse (see models/denoiser.py docstring)
    def precompute_hand_feat(self, feat):
        return self.denoiser_hand.precompute_feat(feat)

    def precompute_obj_feat(self, feat):
        return self.denoiser_obj.precompute_feat(feat)

    def denoise_hand_from_proj(self, feat_proj, x, t, std):
        return self.denoiser_hand.score_from_proj(feat_proj, x, t, std)

    def denoise_obj_from_proj(self, feat_proj, x, t, std):
        return self.denoiser_obj.score_from_proj(feat_proj, x, t, std)

    def __call__(self, data: Dict[str, Array], train: bool = False):
        """Init path: touches every submodule so all params materialize."""
        out = self.trunk(data, train=train)
        B = data["rgb"].shape[0]
        t = jnp.full((B, 1), 0.5)
        std = jnp.ones((B, 1))
        out["_init_hand_score"] = self.denoise_hand(
            out["encoding_hand"], jnp.zeros((B, 96)), t, std)
        out["_init_obj_score"] = self.denoise_obj(
            out["encoding_obj"], jnp.zeros((B, 9)), t, std)
        return out


# ---------------------------------------------------------------------------
# score-fn adapters
# ---------------------------------------------------------------------------


def _score_fn(model: VPHONet, variables, sde: SDE, which: str, feat: Array,
              sample_num: int):
    """Build the (x, t) -> score closure for the ODE loop.

    ``feat`` is the UNREPEATED (B, 1024) conditioning; its first-layer bank
    projection is computed once here and tiled over the sample_num hypotheses
    — removing ~73% of the per-evaluation FLOPs of the dominant term.
    """
    pre = VPHONet.precompute_hand_feat if which == "hand" else VPHONet.precompute_obj_feat
    dn = VPHONet.denoise_hand_from_proj if which == "hand" else VPHONet.denoise_obj_from_proj
    # (B, num, 256) — NOT repeated over sample_num: the bank broadcasts it
    # over each sample's S hypotheses (sample-major layout), so every score
    # evaluation reads B rows of conditioning instead of B*S
    feat_proj = model.apply(variables, feat, method=pre)
    del sample_num  # layout handled inside the bank head

    def fn(x, t):
        _, std = sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model.apply(variables, feat_proj, x, t, std, method=dn)

    return fn


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------


def forward_train(
    model: VPHONet,
    variables,
    ctx: VPHOContext,
    batch: Dict[str, Array],
    rng: Array,
) -> Tuple[Array, Dict[str, Array], Dict[str, Any]]:
    """One training forward: returns (total_loss, loss_dict, mutated_vars).

    Mirrors VPHO.py:175-226 (mode='train').
    """
    cfg = ctx.cfg
    rng_drop, rng_hand, rng_obj = jax.random.split(rng, 3)
    out, mutated = model.apply(
        variables, batch, True, method=VPHONet.trunk,
        mutable=["batch_stats"], rngs={"dropout": rng_drop},
    )

    loss_dt: Dict[str, Array] = {}

    # diffusion score-matching losses (mano_pose head: rot6d pose, no shape)
    gt_mano_6d = T.mano_aa_to_6d(batch["gt_mano"])[..., :-10]

    def hand_score(feat, x, t):
        _, std = ctx.sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model.apply(variables, feat, x, t, std, method=VPHONet.denoise_hand)

    def obj_score(feat, x, t):
        _, std = ctx.sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model.apply(variables, feat, x, t, std, method=VPHONet.denoise_obj)

    loss_dt["diff_hand_loss"] = score_matching_loss(
        hand_score, rng_hand, out["encoding_hand"], gt_mano_6d, ctx.sde, cfg.repeat_num)
    loss_dt["diff_obj_loss"] = score_matching_loss(
        obj_score, rng_obj, out["encoding_obj"], batch["gt_obj"], ctx.sde, cfg.repeat_num)

    # heatmap losses
    loss_dt["hm_hand_loss"] = joints_mse_loss(out["pd_hm_hand"], batch["hm_hand"])
    loss_dt["hm_obj_loss"] = joints_mse_loss(out["pd_hm_obj"], batch["hm_obj"])

    # MANO regression losses against annotation-space verts/joints
    pd_vert, pd_joint = hand_verts_meters(ctx.mano, out["pd_mano_pose"], out["pd_mano_shape"])
    is_ho3d = batch.get("is_ho3d")
    if is_ho3d is not None:
        aligned = get_joint_aligned_with_ho3d(pd_vert, pd_joint)
        pd_joint = jnp.where(is_ho3d[:, None, None], aligned, pd_joint)
    loss_dt.update(heads.mano_losses(
        out["pd_mano_pose"], out["pd_mano_shape"], pd_vert, pd_joint,
        batch["gt_mano"][:, :48], batch["gt_mano"][:, 48:],
        batch["gt_hand_vert_flip"], batch["gt_hand_jt3d_flip"], batch["is_right"],
    ))

    # physics losses: anchors from GT verts (VPHO.py:207-212)
    gt_force_point, pd_force_global = anchor_lib.force_local_to_global(
        ctx.anchor_tables, out["pd_phy"]["force_local"], batch["gt_hand_vert_flip"])
    loss_dt.update(heads.physics_losses(
        gt_force_point, pd_force_global,
        out["obj_CoM_flipped"], out["pd_phy"]["CoM"],
        batch["force_local"], out["pd_phy"]["force_local"],
        out["gravity_flipped"], batch["is_grasped"],
    ))

    total = 0.0
    weighted = {}
    for k, v in loss_dt.items():
        w = getattr(cfg, f"weight_{k}")
        weighted[k] = v * w
        total = total + weighted[k]
    weighted["total_loss"] = total
    return total, weighted, mutated


# ---------------------------------------------------------------------------
# predict forward (trunk -> diffusion sampling -> aggregation)
# ---------------------------------------------------------------------------


def postprocess_diffusion_hand(final_6d: Array, shape: Array, sample_num: int) -> Array:
    """rot6d diffusion output -> 58-d mano params with regressed shape
    attached (VPHO.py:306-331, mano_pose branch, final samples only)."""
    B = shape.shape[0]
    f = final_6d.reshape(B, sample_num, 16, 6)
    aa = T.matrix_to_axis_angle(T.rotation_6d_to_matrix(f)).reshape(B, sample_num, 48)
    shp = jnp.broadcast_to(shape[:, None], (B, sample_num, 10))
    return jnp.concatenate([aa, shp], axis=-1)


def forward_candidates(
    model: VPHONet,
    variables,
    ctx: VPHOContext,
    batch: Dict[str, Array],
    rng: Array,
    return_trajectory: bool = False,
):
    """Trunk + dual-ODE hypothesis sampling WITHOUT aggregation.

    The candidate-generation stage of the predict pipeline (VPHO.py:228-271),
    factored out so ``--mode infer_candidate`` can dump the raw hypothesis
    sets for offline aggregation studies without paying for the 5-stage HOI
    orchestration.  Returns ``(pd_dt, out)`` where ``out`` is the trunk
    output dict the aggregation stage consumes.
    """
    cfg = ctx.cfg
    S = cfg.sample_num
    out = model.apply(variables, batch, False, method=VPHONet.trunk)
    B = batch["rgb"].shape[0]
    pd_dt: Dict[str, Array] = {}
    reg_vert, reg_joint = hand_verts_meters(ctx.mano, out["pd_mano_pose"], out["pd_mano_shape"])
    pd_dt["reg_hand_vert"], pd_dt["reg_hand_joint"] = reg_vert, reg_joint
    pd_dt["hand_heatmap"] = out["pd_hm_hand"]
    pd_dt["obj_heatmap"] = out["pd_hm_obj"]
    pd_dt["force_local"] = out["pd_phy"]["force_local"]

    # hand + object diffusion over B*S hypotheses: both heads integrate in a
    # SINGLE lax.scan over the concatenated 96+9 state — the per-step dispatch
    # overhead of a second scan is pure waste (the two ODEs are independent;
    # the joint prior factorizes, so the distribution is unchanged)
    score_h = _score_fn(model, variables, ctx.sde, "hand", out["encoding_hand"], S)
    score_o = _score_fn(model, variables, ctx.sde, "obj", out["encoding_obj"], S)

    def score_both(x, t):
        return jnp.concatenate(
            [score_h(x[:, :96], t), score_o(x[:, 96:], t)], axis=-1)

    traj, final = ode_sampler(
        score_both, rng, B * S, 96 + 9, ctx.sde, cfg.sample_T0, cfg.sampling_steps,
        method=cfg.ode_method, return_trajectory=return_trajectory,
        schedule=cfg.ode_schedule,
    )
    final_h, final_o = final[:, :96], final[:, 96:]
    hand_mano = postprocess_diffusion_hand(final_h, out["pd_mano_shape"], S)
    pd_dt["diff_final_hand_mano"] = hand_mano                    # (B, S, 58)
    vert_s, joint_s = hand_verts_meters(
        ctx.mano, hand_mano[..., :48], hand_mano[..., 48:])
    pd_dt["diff_final_hand_vert"] = vert_s                       # (B, S, 778, 3)
    pd_dt["diff_final_hand_joint"] = joint_s
    pd_dt["diff_final_obj_6d"] = final_o.reshape(B, S, 9)
    if return_trajectory:
        pd_dt["diff_inprocess_hand_6d"] = traj[..., :96].reshape(B, S, -1, 96)
        pd_dt["diff_inprocess_obj_6d"] = traj[..., 96:].reshape(B, S, -1, 9)
    return pd_dt, out


def forward_predict(
    model: VPHONet,
    variables,
    ctx: VPHOContext,
    batch: Dict[str, Array],
    rng: Array,
    return_trajectory: bool = False,
) -> Dict[str, Array]:
    """Full predict pipeline (VPHO.py:228-304).  One jittable graph."""
    cfg = ctx.cfg
    pd_dt, out = forward_candidates(
        model, variables, ctx, batch, rng, return_trajectory=return_trajectory)
    hand_mano = pd_dt["diff_final_hand_mano"]

    # aggregation: the default heatmap_cascade/heatmap_cascade pair runs the
    # full 5-stage HOI orchestration; any other --aggregation_mode_hand/obj
    # choice dispatches to the standalone aggregators (args.py:235-245)
    mode_h, mode_o = cfg.aggregation_mode_hand, cfg.aggregation_mode_obj
    if mode_h == "heatmap_cascade" and mode_o == "heatmap_cascade":
        hoi = agg.hoi_aggregate(
            ctx.mano, ctx.registry, ctx.anchor_tables,
            cam_intrinsic=batch["cam_intr_crop_flip"],
            root_joint_flip=batch["root_joint_flip"],
            root_joint=batch["root_joint"],
            is_right=batch["is_right"],
            force_local=out["pd_phy"]["force_local"],
            is_grasped=batch["is_grasped"],
            hand_pose_diff=hand_mano[..., :48],
            hand_pose_regression=out["pd_mano_pose"],
            hand_shape=hand_mano[..., 48:],
            hand_heatmap=out["pd_hm_hand"],
            hand_bbox=batch["bbox_hand"],
            hand_topk=cfg.topk_hand,
            obj_pose6d=pd_dt["diff_final_obj_6d"],
            obj_heatmap=out["pd_hm_obj"],
            obj_bbox=batch["bbox_obj_rect"],
            obj_topk=cfg.topk_obj,
            obj_ids=batch["obj_id"],
            is_weight=cfg.do_weighted_average,
            use_regression_as_candidate=cfg.use_regression_as_candidate,
            do_physics_selection=cfg.do_physics_selection,
        )
        pd_dt["agg_obj_6d"] = hoi["obj_agg_6d"]
        pd_dt["agg_hand_mano"] = hoi["hand_agg_mano"]
        pd_dt["agg_hand_vert"] = hoi["hand_agg_vert"]
        pd_dt["agg_hand_joint"] = hoi["hand_agg_joint"]
        return pd_dt

    hand_res = agg.aggregate_hand(
        mode_h, ctx.mano,
        pose=hand_mano[..., :48], shape=hand_mano[..., 48:],
        pose_regression=out["pd_mano_pose"],
        root_joint=batch["root_joint_flip"],
        cam_intrinsic=batch["cam_intr_crop_flip"],
        heatmap=out["pd_hm_hand"], bbox=batch["bbox_hand"], k=cfg.topk_hand,
        is_weight=cfg.do_weighted_average,
        use_regression_as_candidate=cfg.use_regression_as_candidate,
    )
    # object cascade's force selection needs anchors on the aggregated hand
    hand_vert_cam = hand_res["agg_vert"] + batch["root_joint_flip"][:, None]
    force_point, force_global = anchor_lib.force_local_to_global(
        ctx.anchor_tables, out["pd_phy"]["force_local"], hand_vert_cam)
    obj_res = agg.aggregate_obj(
        mode_o, ctx.registry,
        pose6d=pd_dt["diff_final_obj_6d"],
        root_joint=batch["root_joint"], obj_ids=batch["obj_id"],
        is_right=batch["is_right"],
        cam_intrinsic=batch["cam_intr_crop_flip"],
        heatmap=out["pd_hm_obj"], bbox=batch["bbox_obj_rect"], k=cfg.topk_obj,
        is_weight=cfg.do_weighted_average,
        force_selection=cfg.do_physics_selection,
        force_point=force_point, force_global=force_global,
        is_grasped=batch["is_grasped"],
    )
    pd_dt["agg_obj_6d"] = obj_res["agg_6d"]
    pd_dt["agg_hand_mano"] = hand_res["agg_hand_mano"]
    pd_dt["agg_hand_vert"] = hand_res["agg_vert"]
    pd_dt["agg_hand_joint"] = hand_res["agg_joint"]
    return pd_dt
