#!/usr/bin/env bash
# Run the full pytest suite in four fresh-process chunks.
#
# Why: a single long-lived Ray 2.49 local session reproducibly dies on a
# Ray-internal assertion (task_manager.cc "Tried to complete task that
# was not pending") once a session has created several hundred Datasets
# — an upstream bug, not a repo defect.  The suite passes in any split
# that keeps per-session dataset counts bounded; four alphabetical
# chunks are comfortably under the threshold.  Same workaround as the
# chunked driver-contract replay in .claude/skills/verify/SKILL.md.
set -u
cd "$(dirname "$0")/.."
files=$(ls tests/test_*.py)
n=$(echo "$files" | wc -l)
per=$(( (n + 3) / 4 ))
rc=0
i=0
for chunk in $(echo "$files" | xargs -n "$per" echo | tr ' ' ',' ); do
  i=$((i + 1))
  echo "== chunk $i: $(echo "$chunk" | tr ',' ' ' | wc -w) files"
  python -m pytest $(echo "$chunk" | tr ',' ' ') -q "$@" || rc=1
done
exit $rc
