#!/bin/bash
# Round-5 learning-evidence regeneration (VERDICT r4 item 5):
# families sweep then flagship run, sequential on the one real chip.
set -x
cd /root/repo
timeout 7200 python scripts/demo_families.py --epochs 6 --n 256 --out runs/families_r5 \
  > runs/families_r5.log 2>&1
echo "families rc=$?" >> runs/families_r5.log
timeout 5400 python scripts/demo_synthetic.py --n 1024 --epochs 12 --out runs/flagship_r5b \
  > runs/flagship_r5b.log 2>&1
echo "flagship rc=$?" >> runs/flagship_r5b.log
echo ALL_DONE
