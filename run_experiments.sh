#!/bin/bash
# Run both surrogate experiments sequentially (reference run_experiments.sh:3-12).
set -e

echo "Executing gnn experiment..."
python -m nbody_tpu.experiments.gnn_experiment "$@"

echo "Executing contconv experiment..."
python -m nbody_tpu.experiments.contconv_experiment "$@"

echo "Both experiments executed successfully."
