#!/bin/bash
cd /root/repo
set -x
date
python3 tools/check_oracle.py /root/testdata/sf0.001 > .r9b/oracle_sf0001.log 2> .r9b/oracle_sf0001.err
echo "ORACLE_RC=$?"
date
python -m pytest tests/ -x -q > .r9b/pytest.log 2>&1
echo "PYTEST_RC=$?"
date
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python3 bench.py > .r9b/bench_head.json 2> .r9b/bench_head.err
echo "BENCH_RC=$?"
date
