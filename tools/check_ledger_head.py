#!/usr/bin/env python3
"""Assert that committed bench ledgers were captured at the commit that
sealed them -- the "ladder == HEAD" check (validation tooling only).

Three rounds running (r12-r14), a sealed scale-ladder ledger and the
final HEAD diverged by one commit and only a hand audit caught it.
graft.Bench now stamps every ledger with `head` (git rev-parse HEAD at
capture time) and `dirty` (working tree state); this tool makes the
discipline mechanical:

  python3 tools/check_ledger_head.py BENCH_sf1.json BENCH_sf3.json ...

For every ledger argument it checks, against the commit that LAST
TOUCHED that file in git history (not the current HEAD -- a ledger
sealed three commits ago is fine if it matched the tree THEN):
  * the ledger parses and carries a `head` field (ledgers captured
    before the field existed fail with a regenerate hint);
  * `dirty` is false -- a dirty-tree capture is a dev probe, never a
    sealable ledger;
  * `head` equals the parent state: the sealing commit's tree contains
    exactly the code the bench ran, which means the capture head must be
    either the sealing commit itself (ledger amended into a later
    commit) or an ancestor whose src/main + build.sbt are IDENTICAL to
    the sealing commit's (captured at N, committed in N+1 with only
    non-engine changes between -- the legitimate capture-then-seal flow).

Exit 0 = all pass; 1 = any failure, with one line per problem.
"""
import json
import subprocess
import sys


def git(*args):
    r = subprocess.run(["git"] + list(args), capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"git {' '.join(args)}: {r.stderr.strip()}")
    return r.stdout.strip()


ENGINE_PATHS = ["src/main", "build.sbt"]


def engine_tree_hash(commit):
    """One hash summarizing the engine code at a commit: the tree hashes
    of src/main and build.sbt (tests/docs/ledgers excluded -- committing
    a ledger must not invalidate itself)."""
    parts = []
    for p in ENGINE_PATHS:
        try:
            parts.append(git("rev-parse", f"{commit}:{p}"))
        except RuntimeError:
            parts.append("absent")
    return "|".join(parts)


def check(path):
    problems = []
    try:
        with open(path) as f:
            ledger = json.load(f)
    except (OSError, ValueError) as e:
        return [f"{path}: unreadable ({e})"]
    head = ledger.get("head")
    dirty = ledger.get("dirty")
    if head in (None, "", "unknown"):
        return [f"{path}: no capture-time head field -- regenerate with "
                "the head-stamping graft.Bench"]
    if dirty:
        problems.append(f"{path}: captured on a DIRTY tree -- dev probe, "
                        "not sealable")
    try:
        seal = git("log", "-1", "--format=%H", "--", path)
    except RuntimeError as e:
        return problems + [f"{path}: {e}"]
    if not seal:
        # not committed yet: compare against the current working HEAD
        seal = git("rev-parse", "HEAD")
    try:
        git("cat-file", "-e", f"{head}^{{commit}}")
    except RuntimeError:
        return problems + [f"{path}: capture head {head[:12]} is not a "
                           "commit in this repo"]
    if head == seal:
        return problems
    if engine_tree_hash(head) == engine_tree_hash(seal):
        return problems
    problems.append(
        f"{path}: captured at {head[:12]} but sealed at {seal[:12]} with "
        f"DIFFERENT engine code ({'/'.join(ENGINE_PATHS)} changed between "
        "capture and seal) -- recapture at the seal commit")
    return problems


def main():
    paths = sys.argv[1:]
    if not paths:
        sys.exit("usage: check_ledger_head.py LEDGER.json [...]")
    failed = False
    for p in paths:
        probs = check(p)
        if probs:
            failed = True
            for line in probs:
                print(f"FAIL {line}")
        else:
            print(f"PASS {p}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
