"""Offline pseudo-force label optimization CLI (reference force_optim.py).

Runs the jitted two-phase inner optimization over the train split and writes
``hand_force_*.pkl`` per image.  With no real DexYCB on disk it runs one
synthetic batch end-to-end as a smoke check.  Installed form: the
``vpho-force-optim`` console script (vpho_tpu/cli.py).
"""
from vpho_tpu.cli import force_optim_main as main

if __name__ == "__main__":
    main()
