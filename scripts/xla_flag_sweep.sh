#!/bin/bash
# XLA flag sweep on the flagship train-step bench (real TPU).
# One process at a time (this host is 1-core; see CLAUDE.md).
cd /root/repo
OUT=/tmp/xla_sweep.log
: > "$OUT"
run() {
  local tag="$1"; shift
  local flags="$1"; shift
  echo "=== $tag [$flags] ===" >> "$OUT"
  XLA_FLAGS="$flags" BENCH_STEPS=10 timeout 600 python bench.py >> "$OUT" 2>&1
  echo "rc=$?" >> "$OUT"
}
run baseline ""
run vmem32m "--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem64m "--xla_tpu_scoped_vmem_limit_kib=65536"
run lhs_off "--xla_tpu_enable_latency_hiding_scheduler=false"
run nested_fusion "--xla_tpu_enable_multi_level_nested_loop_fusion=true"
run baseline2 ""
echo ALL_DONE >> "$OUT"
