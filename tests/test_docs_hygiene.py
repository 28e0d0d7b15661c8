"""Docs/results hygiene guard (round-3 structural fix).

Two rounds in a row ended with measurements referenced in RESULTS.md/README.md
that were placeholders ("VVD4W5") or files sitting untracked in the working
tree. This test makes both failure modes loud:

  * no placeholder tokens in the committed docs (TBD/FIXME/bare caps-digit
    table cells);
  * every ``eval_results_*.json`` / ``BENCH_*.json`` / ``logs/*.json``
    mentioned in a doc exists on disk AND is tracked by git — referencing a
    measurement commits you to committing it.

No reference counterpart: the reference repo has no results hygiene at all.
"""
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "RESULTS.md", "BASELINE.md", "DESIGN.md", "PARITY.md",
        "MIGRATION.md"]

# Tokens that look like measurements-to-be: a bare caps+digits blob alone in
# a markdown table cell (the "VVD4W5" shape). Legit acronyms in cells are
# either dashed (DDIM-5), lowercase-mixed, or listed here.
CELL_ALLOW = {"STAGE", "README", "RESULTS", "BASELINE", "JSONL", "SPMD"}


def _doc_text():
    out = {}
    for d in DOCS:
        p = os.path.join(REPO, d)
        if os.path.exists(p):
            with open(p) as f:
                out[d] = f.read()
    return out


def test_no_placeholder_tokens():
    bad = []
    for name, text in _doc_text().items():
        for m in re.finditer(r"\b(TBD|FIXME|PLACEHOLDER|TKTK)\b", text):
            bad.append(f"{name}: {m.group(0)}")
        # bare caps+digit token alone in a table cell
        for m in re.finditer(r"\|\s*\**([A-Z][A-Z0-9]{4,})\**\s*\|", text):
            if m.group(1) not in CELL_ALLOW:
                bad.append(f"{name}: table cell '{m.group(1)}'")
    assert not bad, f"placeholder-looking tokens in docs: {bad}"


def test_no_promises():
    """Round-3 post-mortem: `RESULTS.md:47` promised a "Round-3 per-kernel
    attack below" that never landed, and the guard above sailed past it.
    Rule adopted (VERDICT r3 item 8): never commit a promise, only results.
    Flags (a) promissory vocabulary about measurements-to-be, (b)
    round-stamped forward references ("Round-N ... below") — results get
    written in place when they exist; announcing them is a promise by
    construction."""
    promise_pats = [
        re.compile(r"\b(?:is|are|was|were)\s+queued\b", re.I),
        re.compile(r"\bqueued\s+in\s+`?scripts/", re.I),
        re.compile(r"\b(?:measurement|rerun|eval|bench)\s+(?:is\s+)?pending\b",
                   re.I),
        re.compile(r"\bwill\s+(?:be\s+)?(?:measured|land|run|follow)\b", re.I),
        re.compile(r"\bto\s+be\s+(?:re)?(?:run|measured)\b", re.I),
        re.compile(r"\bnot\s+yet\s+(?:run|measured|landed)\b", re.I),
        re.compile(r"\bRound-\d[^.\n]{0,60}\bbelow\b"),
    ]
    bad = []
    for name, text in _doc_text().items():
        for pat in promise_pats:
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                bad.append(f"{name}:{line}: '{m.group(0)}'")
    assert not bad, (
        "docs contain promises of future measurements — commit results, "
        f"not promises: {bad}")


def test_referenced_measurements_are_tracked():
    tracked = set(subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True,
        text=True).stdout.split())
    if not tracked:  # not a git checkout (e.g. sdist) — nothing to enforce
        pytest.skip("not a git checkout")
    pat = re.compile(
        r"\b((?:logs/|artifacts/)?(?:eval_results|eval_ab|eval_dynab|BENCH|"
        r"MULTICHIP|bench|profile)_[\w{},]*\.json)\b")
    missing, untracked = [], []
    for name, text in _doc_text().items():
        for m in pat.finditer(text):
            ref = m.group(1)
            if "{" in ref:  # brace-expansion shorthand: eval_results_3d{,_x}.json
                pre, rest = ref.split("{", 1)
                alts, post = rest.split("}", 1)
                refs = [pre + a + post for a in alts.split(",")]
            else:
                refs = [ref]
            for r in refs:
                if not os.path.exists(os.path.join(REPO, r)):
                    missing.append(f"{name}: {r}")
                elif r not in tracked:
                    untracked.append(f"{name}: {r}")
    assert not missing, f"docs reference nonexistent measurement files: {missing}"
    assert not untracked, (
        "docs reference measurement files that exist but are NOT git-tracked "
        f"(commit them with the doc change): {untracked}")


def test_on_disk_measurements_are_tracked_and_referenced():
    """Inverse rule (round-4 post-mortem, VERDICT r4 weak #1): queue items
    D2/D3 *finished* but their outputs sat untracked and undigested — the
    promise guard had killed promissory doc text, so orphaned results became
    invisible to every guard. This direction makes them loud: every
    measurement JSON ON DISK must be (a) git-tracked and (b) referenced from
    at least one doc (verbatim, brace-shorthand, or glob mention). A
    measurement nobody wrote about is a measurement nobody digested."""
    import fnmatch
    import glob as globmod

    tracked = set(subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True,
        text=True).stdout.split())
    if not tracked:
        pytest.skip("not a git checkout")

    disk = []
    for pat in ("eval_results_*.json", "eval_ab_*.json", "eval_dynab_*.json",
                "BENCH_*.json", "MULTICHIP_*.json", "artifacts/*.json"):
        disk += [os.path.relpath(p, REPO)
                 for p in globmod.glob(os.path.join(REPO, pat))]

    # Doc mentions: plain names, brace shorthand, or glob mentions.
    mention_pat = re.compile(r"\b([\w/]+(?:\{[\w,]*\})?[\w*]*\.json)\b")
    patterns = set()
    for text in _doc_text().values():
        for m in mention_pat.finditer(text):
            ref = m.group(1)
            if "{" in ref:
                pre, rest = ref.split("{", 1)
                alts, post = rest.split("}", 1)
                patterns.update(pre + a + post for a in alts.split(","))
            else:
                patterns.add(ref)

    def referenced(path):
        base = os.path.basename(path)
        return any(fnmatch.fnmatch(path, p) or fnmatch.fnmatch(base, p)
                   for p in patterns)

    untracked = sorted(p for p in disk if p not in tracked)
    unreferenced = sorted(p for p in disk if p in tracked
                          and not referenced(p))
    assert not untracked, (
        "measurement files on disk but NOT git-tracked — commit or delete "
        f"them: {untracked}")
    assert not unreferenced, (
        "measurement files tracked but never mentioned in any doc — digest "
        f"them into RESULTS.md (or an explicit glob mention): {unreferenced}")
