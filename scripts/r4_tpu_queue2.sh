#!/bin/bash
# Round-4 TPU queue, phases 2-5 (phase 1 = serving sweep runs separately).
# Usage: r4_tpu_queue2.sh [wait_pid] — blocks until wait_pid exits first.
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

# VERDICT item 7: host->device transfer + device-loop overlap
timeout 3600 python scripts/bench_input_pipeline.py --device 2>&1 | tail -20

# VERDICT item 8(b): per-bucket masked step times (the bucketed-training path)
for fd in 1024 2500 4096; do
  timeout 3000 python bench.py --fixdim $fd --mask_frac 0.8 --steps 20 \
    > /tmp/bucket_step_$fd.json 2>/tmp/bucket_step_$fd.err
  tail -1 /tmp/bucket_step_$fd.json
done

# VERDICT item 8(a): bucketed variable-length training session (quality band)
timeout 7200 python main.py --dataset synthetic --synthetic_size 96 \
  --variable_bags true --bucket_sizes 1024,2500,4096 --fixdim 4096 \
  --batch_size 8 --epochs 3 --mode deformpathomic --task_type survival \
  --checkpoints /tmp/bucket_train_ckpt --debug 2>&1 | tail -20

# VERDICT item 6: B=16@4k plateau probe
timeout 7200 python scripts/bench_batch_scaling.py 2>&1 | tail -30

echo QUEUE2_DONE
