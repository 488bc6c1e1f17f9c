#!/usr/bin/env bash
# Round-artifact hygiene guard (rounds 13-17 verdict flags, automated).
#
# The driver drops BENCH_r{N}.json / CORRECTNESS_r{N}.json / VERDICT.md /
# ADVICE.md / LEAKCHECK.json (and sometimes COPYCHECK.json) into the
# working tree between rounds; the round protocol requires them
# committed BEFORE work begins so the round-close snapshot is clean and
# the judge sees the artifacts in history, not as tree drift.
#
# Exit 1 + the offending paths when any round artifact is untracked or
# modified; exit 0 with "round hygiene: clean" otherwise. Run at round
# start AND before the final commit of a session:
#   tools/round_hygiene.sh && sbt test
# The same check runs as a ContractSpec test when GRAFT_ROUND_HYGIENE=1
# (kept opt-in there because mid-session trees are legitimately dirty).
set -u
cd "$(dirname "$0")/.."
bad=$(git status --porcelain -- \
  'BENCH_r*.json' 'CORRECTNESS_r*.json' 'VERDICT.md' 'ADVICE.md' \
  'LEAKCHECK.json' 'COPYCHECK.json' 'BASELINE.md' 'PAPERS.md' \
  'SNIPPETS.md' 'bench_sf*.json' 'duckdb_baseline_sf*.json')
if [ -n "$bad" ]; then
  echo "ROUND HYGIENE: uncommitted round artifacts — commit them now:" >&2
  echo "$bad" >&2
  exit 1
fi
# Stray-junk guard (r18 verdict: an empty JVM .attach_pid* artifact rode
# a `git add -A` into history). ANY untracked, un-ignored file at round
# close is junk or forgotten work: commit it or gitignore it. Tool/IDE
# droppings (.attach_pid*, hs_err_pid*, core dumps, editor swap) are
# never legitimate tree content and are named in the message.
stray=$(git status --porcelain --untracked-files=all | grep '^??' || true)
if [ -n "$stray" ]; then
  echo "ROUND HYGIENE: untracked files — commit, gitignore, or delete:" >&2
  echo "$stray" >&2
  exit 1
fi
echo "round hygiene: clean"
