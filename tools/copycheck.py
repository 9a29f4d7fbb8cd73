#!/usr/bin/env python3
"""Local replica of the driver's copy detector: token-stream similarity of
every main-source file against every reference file (/root/reference).
The reference is CPython; this engine is Scala Spark, so any similarity
above the threshold would indicate mechanical translation rather than the
required re-design. Writes COPYCHECK.json in the driver's
{threshold, flagged} shape so tools/roundclose.sh regenerates every
claimed artifact (r11 verdict task 3).

Method: lex both files to identifier/number/string tokens (comments and
punctuation stripped — similarity must come from structure and naming,
not from braces) and take difflib.SequenceMatcher.ratio() on the token
sequences. Flag any repo file whose best ratio vs any reference file
exceeds the threshold.

Usage: python3 tools/copycheck.py [threshold]   (default 0.6)
Exit 1 on any flagged file."""
import difflib
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|\"[^\"\n]*\"|'[^'\n]*'")
LINE_COMMENT_RE = re.compile(r"//.*$|#.*$", re.M)
BLOCK_COMMENT_RE = re.compile(r"/\*.*?\*/|\"\"\".*?\"\"\"", re.S)


def tokens(path):
    with open(path, encoding="utf-8", errors="replace") as fh:
        text = fh.read()
    text = BLOCK_COMMENT_RE.sub(" ", text)
    text = LINE_COMMENT_RE.sub(" ", text)
    return [t.lower() for t in TOKEN_RE.findall(text)]


def main(threshold):
    repo_files = sorted(
        glob.glob(os.path.join(ROOT, "src/main/**/*.scala"), recursive=True) +
        glob.glob(os.path.join(ROOT, "tools/*.py")))
    ref_files = sorted(
        p for ext in ("py", "scala", "go", "rs", "java", "cpp", "cc", "c")
        for p in glob.glob(os.path.join(REF, f"**/*.{ext}"), recursive=True))
    me = os.path.abspath(__file__)
    ref_tokens = [(p, tokens(p)) for p in ref_files]
    flagged = []
    for rp in repo_files:
        if os.path.abspath(rp) == me:
            continue
        rt = tokens(rp)
        if not rt:
            continue
        best, best_ref = 0.0, None
        for fp, ft in ref_tokens:
            if not ft:
                continue
            # quick upper bound before the quadratic matcher
            m = difflib.SequenceMatcher(None, rt, ft, autojunk=False)
            if m.real_quick_ratio() <= threshold:
                continue
            r = m.ratio()
            if r > best:
                best, best_ref = r, fp
        if best > threshold:
            flagged.append({"file": os.path.relpath(rp, ROOT),
                            "ref": os.path.relpath(best_ref, REF),
                            "ratio": round(best, 3)})
    out = {"threshold": threshold, "flagged": flagged}
    with open(os.path.join(ROOT, "COPYCHECK.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    for f in flagged:
        print(f"COPY {f['file']} ~ {f['ref']} ({f['ratio']})")
    print(f"== copycheck: {len(flagged)} flagged of {len(repo_files)} files "
          f"vs {len(ref_files)} reference files -> COPYCHECK.json")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.6))
