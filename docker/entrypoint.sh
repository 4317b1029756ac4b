#!/bin/bash
# graft container entrypoint — dispatches the operational surface
# (reference Makefile parity) onto spark-submit. The first argument
# picks the verb; everything after it is passed through.
#
#   pipeline [symbols...]        one full DAG run (live with
#                                GRAFT_API_KEY, offline fixtures without)
#   health | validate-env        operational probes (exit code = status)
#   status                       db-status/monitor readout
#   backup <table> <path>        snapshot a managed table
#   restore <path> <table>       restore a snapshot
#   retention [dataDays] [logDays]
#   verify <sfDir> <outDir> [only]   correctness dump (graft.Verify)
#   bench                        benchmark JSON line (graft.Bench,
#                                reads SPARK_GRAFT_SF_DIR)
#   master | worker <masterUrl>  run a Spark standalone daemon instead
#                                of a job (compose wires these)
set -euo pipefail

SPARK_HOME=${SPARK_HOME:-/opt/spark}
JAR=/opt/graft/graft.jar
MASTER=${SPARK_MASTER_URL:-local[${SPARK_GRAFT_CPUS:-4}]}

submit() {
  local klass="$1"; shift
  exec "$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER" \
    --class "$klass" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.extensions=graft.GraftExtensions \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
    "$JAR" "$@"
}

cmd=${1:-pipeline}; shift || true
case "$cmd" in
  master)
    # foreground the daemon: without SPARK_NO_DAEMONIZE the launch
    # script forks and exits, and the container dies with it
    export SPARK_NO_DAEMONIZE=true
    exec "$SPARK_HOME/sbin/start-master.sh" --host 0.0.0.0 ;;
  worker)
    export SPARK_NO_DAEMONIZE=true
    exec "$SPARK_HOME/sbin/start-worker.sh" "${1:?worker needs master url}" ;;
  verify)
    submit graft.Verify "${1:-$GRAFT_SF_DIR}" "${2:-$GRAFT_OUT_DIR}" "${@:3}" ;;
  bench)
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-$GRAFT_SF_DIR} \
      submit graft.Bench "$@" ;;
  pipeline|health|validate-env|status|backup|restore|retention)
    submit graft.Ops "$cmd" "$@" ;;
  *)
    echo "unknown command: $cmd" >&2
    echo "usage: pipeline|health|validate-env|status|backup|restore|retention|verify|bench|master|worker" >&2
    exit 2 ;;
esac
