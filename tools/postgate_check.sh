#!/bin/bash
# Post-scaling-gate verification battery (run ONLY when the gate is idle —
# Spark work during a gate round contaminates its cleanliness gauges).
set -e
cd /root/repo
echo "=== 1. round-4 operator tests (new B55-B57 + alignment/suggest) ==="
python -m pytest tests/test_round4.py -x -q
echo "=== 2. oracle self-check: queries touched this round ==="
python tools/check_oracles.py text_metrics_documents suggest_documents \
    vocab_documents overlap_documents embedding_drift_labels
echo "=== 3. full suite ==="
python -m pytest tests/ -x -q
echo "ALL POST-GATE CHECKS PASSED"
