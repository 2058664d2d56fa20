#!/bin/bash
# Incremental-clustering scaling certificate: fixed 100k tail folded into
# growing key-clustered tables — fold cost must stay flat, full recluster
# grows linearly. Usage: scripts/run_cluster_bench.sh [out.json] [sizes]
set -e
cd /root/repo
sbt -batch "runMain graft.ClusterBench ${1:-/root/repo/CLUSTER_BENCH_r14.json} ${2:-1000000,4000000,16000000}"
