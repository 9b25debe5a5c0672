#!/bin/bash
# Round-5 serialized TPU job queue. One chip -> strictly one job at a time;
# campaign_r05.py resumes from its ledger + per-run dedup on restart.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
exec python scripts/campaign_r05.py "$@"
