#!/bin/bash
cd /root/repo
date
sh tools/refresh_evidence.sh r9 > .r9b/refresh_r9.log 2>&1
echo "REFRESH_RC=$?"
date
python -m pytest tests/ -x -q > .r9b/pytest_final.log 2>&1
echo "PYTEST_RC=$?"
date
