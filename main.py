"""Train/eval/infer CLI — parity with the reference main.py (22 lines there).

Usage mirrors the reference:
    python main.py --mode train --batch_size 64 ...
    python main.py --mode eval --checkpoint out/.../epoch_45.state \
        --sample_T0 0.65 --sample_num 100 --topk_hand 30 --topk_obj 10

With no real DexYCB under --data_dir, a synthetic fixture stream is used so
the full pipeline (train step, eval metrics, pkl dumps) still runs
end-to-end.
"""
import os
import sys

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from vpho_tpu.configs.config import get_config  # noqa: E402


def main():
    cfg = get_config()
    from vpho_tpu.engine.runner import run

    # full mode surface of the reference dispatch (main.py:10-22 there);
    # runner.run handles each, incl. the loud NotImplementedError for
    # 'energy' (dead in the reference too)
    run(cfg)


if __name__ == "__main__":
    main()
