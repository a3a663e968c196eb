"""Measure the reference's eval hot loop on THIS host (torch CPU).

The reference (zhoujun-7/VPHO) publishes no throughput numbers. Its eval
pipeline is dominated by `cond_ode_sampler` (reference
`lib/model/score_based_model.py:45-105`): scipy RK45 integrated on the HOST,
with one denoiser forward per RHS evaluation, at a flattened batch of
bs*sample_num = 64*100 = 6400 for the blessed config (README Evaluation).

This script imports the reference's own sde/denoiser/sampler modules
(read-only, no copying) and measures:
  1. per-RHS-eval denoiser forward cost at the blessed flattened batch,
  2. a full `cond_ode_sampler` call (hand 96-d head and obj 9-d head) at a
     reduced hypothesis count to count nfev (nfev is set by RK45 error
     control over the time axis, approximately independent of batch),
  3. the host-side scaffolding cost (RK45 stepping + numpy<->torch copies).

From these it derives two reference throughput anchors written to
BASELINE_MEASURED.json:
  - ref_cpu_fps: measured floor — the reference pipeline run on this host
    (sampler time only; trunk+aggregation excluded, which OVERSTATES the
    reference, i.e. is conservative for our vs_baseline).
  - ref_gpu_fps_optimistic: measured host scaffolding + nfev * (denoiser
    FLOPs / assumed 10 TFLOP/s effective fp32 GPU) — an optimistic estimate
    of the CUDA reference, used as the vs_baseline denominator in bench.py.
"""
import json
import sys
import time
import types

# the reference vendors `ipdb` imports (lib/model/sde.py:6); stub it so the
# modules import on this host without adding dependencies
_ipdb = types.ModuleType("ipdb")
_ipdb.set_trace = lambda *a, **k: None
sys.modules.setdefault("ipdb", _ipdb)
sys.argv = [sys.argv[0]]  # lib/configs/args.py parses argv at import time
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.manual_seed(0)

from lib.model.denoiser import BaseDenoiser  # noqa: E402
from lib.model.score_based_model import cond_ode_sampler  # noqa: E402
from lib.model.sde import init_sde  # noqa: E402

BS = 64            # blessed eval batch (README Evaluation)
S = 100            # sample_num
STEPS = 50         # sampling_steps
T0 = 0.65          # sample_T0
FEAT_DIM = 1024
GPU_TFLOPS = 10e12  # assumed effective fp32 throughput of the reference GPU


def denoiser_flops(head_banks: int, out_dim: int, n: int) -> float:
    """Analytic forward FLOPs of BaseDenoiser at flattened batch n."""
    total_feat = 128 + 256 + 1024
    f = 0.0
    f += n * (128 * 128) * 2                      # t_encoder linear
    f += n * (out_dim * 256 + 256 * 256) * 2      # pose_encoder
    f += n * head_banks * (total_feat * 256 + 256 * 3) * 2  # ParallelLinear bank
    return f


def time_denoiser(den, data, iters=3):
    with torch.no_grad():
        den(data)  # warmup
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            den(data)
            ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def run_sampler(den, prior_fn, sde_fn, eps, n):
    data = {"feat": torch.randn(n, FEAT_DIM)}
    calls = {"n": 0}
    orig_forward = den.forward

    def counting_forward(d):
        calls["n"] += 1
        return orig_forward(d)

    den.forward = counting_forward
    t0 = time.perf_counter()
    _, x = cond_ode_sampler(den.out_dim, den, data, prior_fn, sde_fn,
                            eps=eps, T=T0, num_steps=STEPS)
    dt = time.perf_counter() - t0
    den.forward = orig_forward
    assert torch.isfinite(x).all()
    return dt, calls["n"]


def main():
    small_s = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    prior_fn, marginal_prob_fn, sde_fn, eps, _T = init_sde("ve")
    results = {"bs": BS, "sample_num": S, "steps": STEPS, "T0": T0,
               "host": "torch-cpu", "gpu_assumed_tflops": GPU_TFLOPS / 1e12}

    for name, head, banks in [("hand", "mano_pose", 32), ("obj", "obj", 3)]:
        den = BaseDenoiser(marginal_prob_fn, head=head).eval()
        n_full = BS * S
        data_full = {"feat": torch.randn(n_full, FEAT_DIM),
                     "sampled_pose": torch.randn(n_full, den.out_dim),
                     "t": torch.full((n_full, 1), 0.5)}
        per_eval_full = time_denoiser(den, data_full)

        # nfev measured at a reduced hypothesis count (RK45 error control is
        # over the time axis; nfev is approx. independent of batch width)
        n_small = BS * small_s
        dt_small, nfev = run_sampler(den, prior_fn, sde_fn, eps, n_small)
        data_small = {"feat": torch.randn(n_small, FEAT_DIM),
                      "sampled_pose": torch.randn(n_small, den.out_dim),
                      "t": torch.full((n_small, 1), 0.5)}
        per_eval_small = time_denoiser(den, data_small)
        scaffolding = max(dt_small - nfev * per_eval_small, 0.0)
        # scale host-side copy/stepping cost linearly with state size
        scaffolding_full = scaffolding * (n_full / n_small)

        cpu_time_full = nfev * per_eval_full + scaffolding_full
        flops = denoiser_flops(banks, den.out_dim, n_full)
        gpu_time_full = nfev * (flops / GPU_TFLOPS + 0.003) + scaffolding_full

        results[name] = {
            "nfev": nfev, "per_eval_cpu_s": round(per_eval_full, 4),
            "per_eval_gflops": round(flops / 1e9, 2),
            "sampler_small_s": round(dt_small, 2),
            "scaffolding_full_s": round(scaffolding_full, 3),
            "est_cpu_full_s": round(cpu_time_full, 2),
            "est_gpu_full_s": round(gpu_time_full, 2),
        }
        print(name, results[name], flush=True)

    cpu_total = results["hand"]["est_cpu_full_s"] + results["obj"]["est_cpu_full_s"]
    gpu_total = results["hand"]["est_gpu_full_s"] + results["obj"]["est_gpu_full_s"]
    results["ref_cpu_fps"] = round(BS / cpu_total, 3)
    results["ref_gpu_fps_optimistic"] = round(BS / gpu_total, 3)
    print(json.dumps(results, indent=1))
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
