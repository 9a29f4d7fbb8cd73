#!/usr/bin/env python3
"""Run tools/check.py over the full declared inventory in CHUNKS, one
fresh subprocess (= one fresh DuckDB connection) per chunk.

Why: a single DuckDB connection accumulates memory across consecutive
multi-10M-row oracle compares and eventually OOMs on a tiny allocation
(observed ~13 big queries in at the 100x corpus). Chunking bounds the
per-connection work; a failed chunk names its queries so a resume is a
copy-paste. Usage:
    python3 tools/check_chunked.py <sfDir> <verifyOutDir> [chunkSize]
(Developer tooling only — the driver's own gate runs at sf0.01 where a
single connection is fine.)"""
import json, subprocess, sys

def main(sf_dir, out_dir, chunk=25):
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    ok = bad = 0
    failed = []
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        r = subprocess.run(
            [sys.executable, "tools/check.py", sf_dir, out_dir] + part,
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        sys.stdout.flush()
        seen = set()
        for line in r.stdout.splitlines():
            if line.startswith("OK "):
                ok += 1
                seen.add(line.split()[1].rstrip(":"))
            elif line.startswith("FAIL"):
                bad += 1
                name = line.split()[1].rstrip(":")
                failed.append(name)
                seen.add(name)
        # A chunk whose subprocess died mid-way (OOM-kill, crash — the very
        # failure mode this tool mitigates) emits no FAIL lines for its
        # unprocessed queries; counting only printed lines would leave
        # bad == 0 and the gate would exit 0 — a false-green. Any query in
        # the chunk with no verdict line, or a nonzero return code, is a
        # failure.
        missing = [n for n in part if n not in seen]
        # rc=1 with zero missing is check.py's own "had FAILs" exit — those
        # are already counted from their FAIL lines; only a died-mid-chunk
        # process (missing verdicts) needs synthesizing here.
        if missing:
            sys.stdout.write(
                f"!! chunk rc={r.returncode}: {r.stderr.strip()[-300:]}\n")
            for n in missing:
                sys.stdout.write(f"FAIL {n}: no verdict (chunk died)\n")
                bad += 1
                failed.append(n)
    print(f"== TOTAL {ok} ok, {bad} fail")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if bad else 0

if __name__ == "__main__":
    cs = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    sys.exit(main(sys.argv[1], sys.argv[2], cs))
