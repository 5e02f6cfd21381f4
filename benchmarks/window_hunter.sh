#!/bin/bash
# Probe the axon TPU tunnel; when a window opens, refresh bench artifacts.
# Run under: nohup bash benchmarks/window_hunter.sh & echo $! > /tmp/hunter.pid
cd /root/repo
for i in $(seq 1 60); do
  if timeout 70 python -c "import jax,jax.numpy as jnp; d=jax.devices(); assert d[0].platform!='cpu'; jax.jit(lambda a:a*2)(jnp.ones((128,128))).block_until_ready(); print('TPU_OK')" 2>/dev/null | grep -q TPU_OK; then
    echo "$(date +%s) window open" >> /tmp/hunter.log
    PGT_BENCH_CHILD=1 timeout 560 python bench.py > /tmp/bench_tpu_run.json 2>/tmp/bench_tpu_run.err
    if grep -q '"backend": "axon"\|"backend": "tpu"' /tmp/bench_tpu_run.json; then
      echo "$(date +%s) bench ok: $(cat /tmp/bench_tpu_run.json)" >> /tmp/hunter.log
      python - <<'EOF'
import json, time
rec = json.load(open('/tmp/bench_tpu_run.json'))
with open('/root/repo/bench_windows.jsonl', 'a') as f:
    f.write(json.dumps({'ts': int(time.time()), 'run': rec}) + '\n')
EOF
      bash benchmarks/window_suite.sh >> /tmp/hunter.log 2>&1
      exit 0
    fi
    echo "$(date +%s) bench failed/cpu" >> /tmp/hunter.log
  fi
  sleep 240
done
echo "$(date +%s) gave up" >> /tmp/hunter.log
