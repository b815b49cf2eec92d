#!/usr/bin/env python3
"""Assert that committed bench/probe artifacts were captured at the
commit that sealed them -- the "ladder == HEAD" check (validation
tooling only).

Three rounds running (r12-r14), a sealed scale-ladder ledger and the
final HEAD diverged by one commit and only a hand audit caught it.
graft.Bench (and tools/iso_probe.py) stamp every artifact with `head`
(git rev-parse HEAD at capture time) and `dirty` (engine working-tree
state); this tool makes the discipline mechanical:

  python3 tools/check_ledger_head.py BENCH_sf1.json BENCH_sf3.json ...
  python3 tools/check_ledger_head.py --all

For every artifact it checks, against the commit that LAST TOUCHED that
file in git history (not the current HEAD -- a ledger sealed three
commits ago is fine if it matched the tree THEN):
  * the artifact parses and carries a `head` field (artifacts captured
    before the field existed are LEGACY -- see below);
  * `dirty` is false -- a dirty-tree capture is a dev probe, never a
    sealable artifact;
  * `head` is a commit of this repo AND an ANCESTOR of the sealing
    commit (or the sealing commit itself) -- a capture head from a
    side branch or a descendant is not "the code this commit sealed"
    even if its engine tree happens to match (r15 ADVICE);
  * the capture head's src/main + build.sbt are IDENTICAL to the
    sealing commit's (captured at N, committed in N+1 with only
    non-engine changes between -- the legitimate capture-then-seal
    flow);
  * the file's WORKING-TREE bytes equal the sealed blob -- an edited
    ledger would otherwise validate against its stale last-touch
    commit (r15 ADVICE).

Artifact kinds (detected from the JSON, no filename conventions):
  * graft.Bench ledgers (`head` at top level, `queries`/`metric`):
    a ledger carrying a `note` with "before" is a deliberate
    prior-state baseline (e.g. an optimization round's same-host
    baseline captured at the previous round's seal) -- exempt from
    the tree match like BEFORE probes, but the capture head must
    still be a clean ancestor commit;
  * tools/iso_probe.py probes (`tool` == "tools/iso_probe.py"):
    same rules, EXCEPT a probe whose `note` contains the word
    "before" is a BEFORE-fix baseline that intentionally pins an older
    engine state -- it is exempt from the tree/ancestry match (still
    must be clean and a real commit). Notes containing "rejected" or
    "reverted" get the same exemption: a probe that measured a
    candidate rework which was then reverted pins the rejected
    variant's commit BY DESIGN -- it is the evidence for the revert
    decision, and recapturing it at the seal would measure the wrong
    code. The note must say which commit reverted it so the pairing
    stays hand-auditable. This makes the r15 hand-audit of
    before/after probe pairs mechanical: AFTER probes must match their
    seal's engine tree. Probes sealed before THIS pairing rule existed
    (second `git log -S` epoch, on this file) are LEGACY-iso: r15's
    after-probes were captured at commits whose engine trees differ
    from their seals by doc-string edits and unrelated kernels the
    then-current hand-audit deemed equivalent -- the tool cannot
    retroactively assert what was never stamped, so it reports them
    distinctly instead of failing history that cannot be recaptured
    (the r16+ replacements are checked strictly).
  * driver round captures (`rc` + `tail`): the provenance line is
    embedded in the captured stdout tail; it is extracted and checked
    like a Bench ledger when present.

LEGACY: artifacts whose sealing commit predates the head-stamping
epoch (the commit that introduced the stamp, found mechanically via
`git log -S`) cannot carry provenance and are reported as LEGACY, not
failures -- they are historical evidence, not regenerable. An artifact
sealed AFTER the epoch with no head field FAILS.

Exit 0 = all pass (LEGACY counts as pass, printed distinctly);
1 = any failure, with one line per problem.
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

# anchor git to the repo this script lives in, never the caller's cwd
# (r15 ADVICE: invoked from outside the repo, the old form inspected
# whichever repo the shell happened to be in)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git(*args, check=True):
    r = subprocess.run(["git"] + list(args), cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        if check:
            raise RuntimeError(f"git {' '.join(args)}: {r.stderr.strip()}")
        return None
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


def is_ancestor(a, b):
    """True iff commit a is b or an ancestor of b."""
    r = subprocess.run(["git", "merge-base", "--is-ancestor", a, b],
                       cwd=REPO, capture_output=True, text=True)
    return r.returncode == 0


def stamp_epoch():
    """The commit that introduced head-stamping (mechanical cutoff for
    LEGACY artifacts): the oldest commit whose diff to Bench.scala
    touches the '"head":"' stamp string."""
    out = git("log", "--format=%H", "-S", '"head":"', "--",
              "src/main/scala/graft/Bench.scala", check=False)
    return out.splitlines()[-1] if out else None


def iso_rule_epoch():
    """The commit that introduced the iso-probe pairing rule here:
    the mechanical LEGACY cutoff for pre-rule probe artifacts."""
    out = git("log", "--format=%H", "-S", "LEGACY-iso", "--",
              "tools/check_ledger_head.py", check=False)
    return out.splitlines()[-1] if out else None


EPOCH = None      # head-stamping epoch, resolved once in main()
ISO_EPOCH = None  # iso-pairing-rule epoch, resolved once in main()


def seal_commit(path):
    rel = os.path.relpath(os.path.abspath(path), REPO)
    seal = git("log", "-1", "--format=%H", "--", rel)
    return (seal or None), rel


def blob_matches_working_tree(seal, rel):
    """The on-disk bytes must be exactly what the seal commit recorded —
    a hand-edited ledger otherwise validates against its stale
    last-touch commit."""
    sealed = git("rev-parse", f"{seal}:{rel}", check=False)
    on_disk = git("hash-object", "--", rel, check=False)
    return sealed is not None and sealed == on_disk


# provenance line inside a driver capture's stdout tail
TAIL_RE = re.compile(r'"head":"([0-9a-f]{40}|unknown)","dirty":(true|false)')


def extract_provenance(ledger):
    """(kind, head, dirty, note) from any known artifact shape."""
    if ledger.get("tool") == "tools/iso_probe.py":
        return ("iso", ledger.get("head"), ledger.get("dirty"),
                str(ledger.get("note") or ""))
    if "tail" in ledger and "rc" in ledger:
        m = TAIL_RE.search(ledger.get("tail") or "")
        if m:
            return ("driver", m.group(1), m.group(2) == "true", "")
        return ("driver", None, None, "")
    return ("bench", ledger.get("head"), ledger.get("dirty"),
            str(ledger.get("note") or ""))


BEFORE_RE = re.compile(r"\b(before|rejected|reverted)\b", re.IGNORECASE)


def check(path):
    problems = []
    try:
        with open(path) as f:
            ledger = json.load(f)
    except (OSError, ValueError) as e:
        return False, [f"{path}: unreadable ({e})"]
    kind, head, dirty, note = extract_provenance(ledger)
    try:
        seal, rel = seal_commit(path)
    except RuntimeError as e:
        return False, [f"{path}: {e}"]
    committed = seal is not None
    if not committed:
        # not committed yet: compare against the current working HEAD
        seal = git("rev-parse", "HEAD")
    if head in (None, "", "unknown"):
        # LEGACY iff sealed before provenance stamping existed
        if committed and EPOCH and not is_ancestor(EPOCH, seal):
            return True, [f"{path}: LEGACY (sealed pre-stamping, "
                          f"kind={kind}) -- historical evidence, exempt"]
        return False, [f"{path}: no capture-time head field -- regenerate "
                       "with the head-stamping graft.Bench / iso_probe"]
    if dirty:
        problems.append(f"{path}: captured on a DIRTY tree -- dev probe, "
                        "not sealable")
    if git("cat-file", "-e", f"{head}^{{commit}}", check=False) is None:
        return False, problems + [f"{path}: capture head {head[:12]} is "
                                  "not a commit in this repo"]
    if committed and not blob_matches_working_tree(seal, rel):
        problems.append(
            f"{path}: working-tree bytes differ from the sealed blob at "
            f"{seal[:12]} -- edited after sealing; re-seal or restore")
    if kind in ("iso", "bench") and BEFORE_RE.search(note):
        # BEFORE-fix baseline or rejected-variant probe: intentionally
        # pins a non-seal engine state (e.g. an optimization round's
        # same-host baseline captured at the PRIOR round's seal, then
        # committed alongside the round's first engine change); clean
        # capture + real ancestor commit is all that can be asserted
        if not is_ancestor(head, seal):
            problems.append(
                f"{path}: capture head {head[:12]} is not an ancestor of "
                f"seal {seal[:12]} -- side-branch capture")
        return len(problems) == 0, problems or [
            f"{path}: BEFORE/REJECTED artifact (note: {note[:60]!r}) -- "
            "engine-state match exempt by design"]
    if head != seal:
        mismatch = None
        if not is_ancestor(head, seal):
            mismatch = (
                f"{path}: capture head {head[:12]} is not an ancestor of "
                f"seal {seal[:12]} -- side-branch or descendant capture, "
                "not the code this commit sealed")
        elif engine_tree_hash(head) != engine_tree_hash(seal):
            mismatch = (
                f"{path}: captured at {head[:12]} but sealed at "
                f"{seal[:12]} with DIFFERENT engine code "
                f"({'/'.join(ENGINE_PATHS)} changed between capture and "
                "seal) -- recapture at the seal commit")
        if mismatch and kind == "iso" and committed and ISO_EPOCH \
                and not is_ancestor(ISO_EPOCH, seal):
            return len(problems) == 0, problems + [
                f"{path}: LEGACY-iso (sealed before the pairing rule; "
                f"capture {head[:12]} vs seal {seal[:12]} differ) -- "
                "superseded by the strictly-checked r16 recapture"]
        if mismatch:
            problems.append(mismatch)
    return len(problems) == 0, problems


def main():
    global EPOCH, ISO_EPOCH
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*")
    ap.add_argument("--all", action="store_true",
                    help="check every BENCH_*.json / bench_*.json at the "
                         "repo root")
    args = ap.parse_args()
    paths = args.paths
    if args.all:
        candidates = sorted(set(glob.glob(os.path.join(REPO, "BENCH_*.json")))
                            | set(glob.glob(os.path.join(REPO, "bench_*.json"))))
        tracked = set(git("ls-files").splitlines())
        for c in candidates:
            rel = os.path.relpath(c, REPO)
            if rel in tracked:
                paths.append(c)
            else:
                # --all audits COMMITTED artifacts; an untracked ledger is
                # dev scratch by definition (e.g. the driver's default
                # bench_full.json output). Explicit-path mode still checks
                # untracked files against the current HEAD for pre-seal use.
                print(f"SKIP {c}: untracked dev artifact (not in git)")
        paths = sorted(set(paths))
    if not paths:
        sys.exit("usage: check_ledger_head.py LEDGER.json [...] | --all")
    EPOCH = stamp_epoch()
    ISO_EPOCH = iso_rule_epoch()
    failed = False
    for p in paths:
        ok, lines = check(p)
        if not ok:
            failed = True
            for line in lines:
                print(f"FAIL {line}")
        elif lines:
            for line in lines:
                print(f"PASS {line}")
        else:
            print(f"PASS {p}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
