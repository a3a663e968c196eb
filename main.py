"""Train/eval/infer CLI — parity with the reference main.py (22 lines there).

Usage mirrors the reference:
    python main.py --mode train --batch_size 64 ...
    python main.py --mode eval --checkpoint out/.../epoch_45.state \
        --sample_T0 0.65 --sample_num 100 --topk_hand 30 --topk_obj 10

With no real DexYCB under --data_dir, a synthetic fixture stream is used so
the full pipeline (train step, eval metrics, pkl dumps) still runs
end-to-end.  Installed form: the ``vpho`` console script (vpho_tpu/cli.py).
"""
from vpho_tpu.cli import train_eval_main as main

if __name__ == "__main__":
    main()
