#!/bin/sh
# Re-warm the committed XLA compilation cache for the multichip dryrun
# (.jax_cache_dryrun). Run after changing anything the dryrun compiles
# (trainers, pipeline, parallel layer), then commit the cache dir:
#
#   sh tools/warm_dryrun_cache.sh && git add .jax_cache_dryrun && \
#       git commit -m 'refresh dryrun compile cache'
#
# The dryrun orchestrator (__graft_entry__.dryrun_multichip) sets its own
# JAX_PLATFORMS/XLA_FLAGS in a subprocess, so a plain invocation warms the
# exact configuration the driver runs.
set -e
cd "$(dirname "$0")/.."
KBE_DRYRUN_DEVICES=8 python __graft_entry__.py
