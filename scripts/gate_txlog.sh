#!/bin/bash
set -e
cd /root/repo
sbt -batch test
rm -rf /tmp/vfy_tx
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY=s2_cache_reuse,s5_compaction,s6_schema_evolution,s7_upsert,s8_delete,s9_incremental_rollup,s10_txlog_timetravel,s11_txlog_fold,s12_partitioned_upsert,s13_rollup_distinct_sketch,s14_column_mapping,s15_restore,s16_incremental_read,sql3_txlog_sql,sql4_txlog_dml \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vfy_tx"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vfy_tx
echo "=== TXGATE DONE ==="
