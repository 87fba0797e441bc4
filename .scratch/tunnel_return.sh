#!/bin/bash
# run all queued TPU jobs sequentially; each logs to .scratch/
cd /root/repo
set -x
python .scratch/auto_pallas_check.py > .scratch/auto_pallas_check.log 2>&1
python .scratch/joint_study.py       > .scratch/joint_study.log 2>&1
python .scratch/diff_ld_study.py     > .scratch/diff_ld_study.log 2>&1
python .scratch/verify_ld.py         > .scratch/verify_ld_tpu.log 2>&1
python .scratch/adaptive_study.py      > .scratch/adaptive_study.log 2>&1
python bench.py --quick              > .scratch/bench_postld.log 2>&1
echo ALL-DONE
