"""Round-5 tomography quality study (BASELINE.md "Tomography at scale").

Sweeps priors (L1, TV) and view counts for the 16^3 reconstruction at the
round-4 protocol (128x96 targets @64spp, 16spp/render, kernel backend),
then runs the 32^3 study the nearest-interpolant kernels unlocked, and the
free-vs-equi-angular comparison row (the reference's research question in
voxel-gradient form). One v5e chip; ~1h total.

Run: python tools/studies/tomo_quality_study.py [--quick]
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..", "..")
EX = os.path.join(ROOT, "examples", "recover_grid.py")

CONFIGS = [
    # (tag, args)
    ("A_r4_repro_nearest", ["--n", "16", "--views", "6", "--steps", "250",
                            "--reg-l1", "2e-2", "--interp", "nearest"]),
    ("B_plus_tv", ["--n", "16", "--views", "6", "--steps", "250",
                   "--reg-l1", "2e-2", "--reg-tv", "1e-2",
                   "--interp", "nearest"]),
    ("C_12views_tv", ["--n", "16", "--views", "12", "--steps", "350",
                      "--reg-l1", "2e-2", "--reg-tv", "1e-2",
                      "--interp", "nearest"]),
    ("D_12views_tv_light_l1", ["--n", "16", "--views", "12", "--steps",
                               "350", "--reg-l1", "5e-3", "--reg-tv",
                               "1e-2", "--interp", "nearest"]),
    ("E_32cubed_12views", ["--n", "32", "--views", "12", "--steps", "350",
                           "--reg-l1", "5e-3", "--reg-tv", "1e-2",
                           "--interp", "nearest"]),
    ("F_equiangular_6views", ["--n", "16", "--views", "6", "--steps",
                              "250", "--reg-l1", "2e-2", "--reg-tv",
                              "1e-2", "--interp", "nearest",
                              "--distance", "equiangular"]),
]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    for tag, args in CONFIGS:
        if quick:
            args = args + ["--steps", "30", "--target-spp", "16"]
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
