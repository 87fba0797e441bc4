"""Round-5 tomography polish study (BASELINE.md "Tomography quality").

Takes the quality study's winner (D: 16^3, 12 views, L1 5e-3 + TV 1e-2,
nearest transport interpolant, kernel backend) and adds the two
optimizer-side levers the round-5 fog study showed matter with
stochastic A/B-MSE gradients: an exponentially DECAYED learning rate
(constant lr leaves the iterate wandering in an O(lr) noise ball) and a
Polyak TAIL AVERAGE of the projected iterates (averages over the
residual ball at zero extra render cost). Goal: corr(rec, truth) >= 0.9
at 16^3. One v5e chip.

Run: python tools/studies/tomo_polish_study.py [--quick]
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..")
EX = os.path.join(ROOT, "examples", "recover_grid.py")

BASE = ["--n", "16", "--views", "12", "--reg-l1", "5e-3",
        "--reg-tv", "1e-2", "--interp", "nearest"]

CONFIGS = [
    # (tag, args) — D_repro is the quality study's winner re-run as the
    # in-study baseline; the rest add decay / polyak / longer schedules.
    ("D_repro", BASE + ["--steps", "350"]),
    ("P1_decay", BASE + ["--steps", "350", "--lr-decay", "0.05"]),
    ("P2_decay_polyak", BASE + ["--steps", "350", "--lr-decay", "0.05",
                                "--polyak", "0.25"]),
    ("P3_long_decay_polyak", BASE + ["--steps", "600",
                                     "--lr-decay", "0.02",
                                     "--polyak", "0.25"]),
]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    for tag, args in CONFIGS:
        if quick:
            args = args + ["--steps", "30", "--target-spp", "16",
                           "--views", "4"]
        t0 = time.time()
        print(f"=== {tag}: {' '.join(args)}", flush=True)
        r = subprocess.run([sys.executable, EX] + args, cwd=ROOT,
                           capture_output=True, text=True)
        tail = "\n".join(r.stdout.strip().splitlines()[-3:])
        print(tail, flush=True)
        print(f"=== {tag} done rc={r.returncode} {time.time()-t0:.0f}s",
              flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], flush=True)
