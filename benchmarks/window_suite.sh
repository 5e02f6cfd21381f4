#!/bin/bash
# Full A/B matrix for one open tunnel window. Run AFTER a probe says the
# window is open; appends every JSON line to bench_windows.jsonl.
cd /root/repo
TS=$(date +%s)
run() {
  desc="$1"; shift
  out=$(timeout 560 python "$@" 2>/dev/null | grep '^{' | tail -1)
  if [ -n "$out" ]; then
    echo "{\"ts\": $TS, \"desc\": \"$desc\", \"run\": $out}" >> bench_windows.jsonl
    echo "$desc: $out"
  else
    echo "$desc: FAILED"
  fi
}
run bench            bench.py            # headline (PGT_BENCH_CHILD avoided: watchdog probes itself)
run spmm_xla         benchmarks/spmm_bench.py --xla --steps 30
run spmm_auto        benchmarks/spmm_bench.py --steps 30
run spmm_dense       benchmarks/spmm_bench.py --dense --nodes 10000 --edges 200000 --steps 50
run spmm_dense_bf16  benchmarks/spmm_bench.py --dense --bf16 --nodes 10000 --edges 200000 --steps 50
run grouped_uniform  benchmarks/grouped_bench.py --skew uniform --reps 10
run grouped_powerlaw benchmarks/grouped_bench.py --skew powerlaw --reps 10
run spmm_bsr_clust   benchmarks/spmm_bench.py --bsr --clustered 256 --steps 30
run spmm_bsr_plaw    benchmarks/spmm_bench.py --bsr --powerlaw --steps 30
# products-scale (ogbn-products N/E on a synthetic graph): the honest
# single-chip edges/s record. Last: large transfers can outlive a window.
run spmm_products    benchmarks/spmm_bench.py --nodes 2449029 --edges 61859140 --features 100 --steps 3
run int8_infer       benchmarks/spmm_bench.py --int8 --nodes 10000 --edges 200000 --steps 100
run bf16_infer       benchmarks/spmm_bench.py --dense --bf16 --infer --nodes 10000 --edges 200000 --steps 100
run attn_fused       benchmarks/attention_bench.py --steps 10
run attn_xla         benchmarks/attention_bench.py --steps 10 --xla
