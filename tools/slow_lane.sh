#!/bin/sh
# Full-suite lane: fast AND slow tests (the default addopts deselect slow).
# Run periodically — the slow tail holds the 1M-scene sharded build, the
# bunny-scale collapse SAH gate, and the acceptance tails.
cd "$(dirname "$0")/.." || exit 1
exec python -m pytest tests/ -q -m "slow or not slow" "$@"
