#!/usr/bin/env python3
"""Local replica of the driver's leak gate: scan the repo's source and docs
for content that must never appear in a public, self-contained library —
non-public imports, URLs outside a known-public allowlist, cloud bucket
URIs, chat links, credential-looking strings, and environment variables
not declared by this project. Prints a summary and writes LEAKCHECK.json
in the same {round, n_hits, hits} shape the driver emits, so
tools/roundclose.sh regenerates every claimed artifact (r11 verdict task 3).

Usage: python3 tools/leakcheck.py [round_number]
Exit 1 on any hit."""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_DIRS = ["src", "tools"]
SCAN_FILES = ["build.sbt", "Bench.scala", "Verify.scala", "SURVEY.md",
              "DEPLOYMENT.md", "COVERAGE.md", "BASELINE.md", "BASELINE_HISTORY.md",
              "TESTDATA.md"]
EXT = (".scala", ".py", ".sbt", ".md", ".sh", ".json", ".conf")

# Everything this library may import: Spark + its bundled deps, the JDK,
# Scala, our own package, and the test stack declared in build.sbt.
IMPORT_OK = re.compile(
    r"^\s*import\s+(org\.apache\.(spark|hadoop|logging|parquet)|scala\b|java\b|"
    r"javax\b|graft\b|com\.fasterxml\.jackson|org\.scalatest|org\.scalacheck|"
    r"org\.slf4j|sys\b|json\b|os\b|re\b|glob\b|subprocess\b|time\b|math\b|"
    r"difflib\b|duckdb\b|pandas\b|pyarrow\b|collections\b|pathlib\b|shutil\b|"
    r"argparse\b|random\b|struct\b|hashlib\b|itertools\b|signal\b|"
    r"statistics\b|[a-z][\w.]*\.(implicits|sparkSession\.implicits)\._)")
IMPORT_RE = re.compile(r"^\s*import\s+[A-Za-z_][\w.{}, _=>]*")

# Public hosts this project legitimately mentions (reference behavior,
# docs, synthetic endpoints). Anything else is a leak candidate.
# END-ANCHORED against the captured scheme+host (URL_RE stops at the
# host, so $ is the host boundary) and every allowlisted domain must be
# the host's TERMINAL labels — prefix tricks like t.coevil.net or
# notgoogle.com.attacker.io no longer pass (r12 ADVICE).
URL_OK = re.compile(
    r"https?://("
    r"localhost|searchhead|\d+\.\d+\.\d+\.\d+"
    # the example/test families: example.com/.org with any subdomain,
    # plus the bare *.example synthetic hosts the specs construct
    r"|([\w-]+\.)*example(\.com|\.org)?"
    # public project/doc hosts, any subdomain, terminal-label anchored
    r"|([\w-]+\.)*(apache\.org|github\.com|pastebin\.com|twitter\.com"
    r"|t\.co|splunk\.com|splunkcloud\.com|duckdb\.org|scala-lang\.org"
    r"|scalatest\.org|w3\.org|json\.org|maven\.org|google\.com|x\.y\.com)"
    # code-constructed attacker fixtures: every in-tree http(s)://evil…
    # literal is a truncated concat stem ("https://evil-" + id + ".example…"),
    # which the caller's rstrip reduces to the BARE stem — so only that
    # exact stem is allowlisted. The r13 `evil[\w.-]*` wildcard would have
    # passed a real leak to any evil-prefixed external host (ADVICE r13);
    # full evil hosts must end in the example/test families above.
    r"|evil"
    r")$")
URL_RE = re.compile(r"https?://[\w.-]+")

BUCKET_RE = re.compile(r"\b(s3a?|gs|wasbs?|abfss?)://[\w.-]+")
SLACK_RE = re.compile(r"[\w.-]*slack\.com|slack://")
KEY_RE = re.compile(
    r"\bAKIA[0-9A-Z]{16}\b|-----BEGIN [A-Z ]*PRIVATE KEY-----|"
    r"(?i:(api[_-]?key|secret|token|passw(or)?d)\s*[:=]\s*[\"'][A-Za-z0-9+/]{16,}[\"'])")

# Env vars this project declares (code + docs). Unknown env reads suggest
# a dependency on an environment this public repo cannot assume.
ENV_OK = re.compile(
    r"^(SPARK(_GRAFT)?_[A-Z0-9_]+|CHECK_DUCKDB_[A-Z]+|ROUNDCLOSE_[A-Z0-9_]+|"
    r"JAVA_[A-Z_]+|COURSIER_[A-Z_]+|SBT_[A-Z_]+|PATH|HOME|PWD|TMPDIR|USER|"
    r"LANG|LC_[A-Z]+|TZ|TERM)$")
ENV_SCALA_RE = re.compile(r"sys\.env(?:\.get(?:OrElse)?)?\(\"([A-Z0-9_]+)\"")
ENV_PY_RE = re.compile(r"os\.environ(?:\.get)?[\[(]['\"]([A-Z0-9_]+)['\"]")


def files():
    for d in SCAN_DIRS:
        for base, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if n.endswith(EXT):
                    yield os.path.join(base, n)
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p


def main(rnd):
    hits = {"nonpublic-import": [], "nonpublic-url": [], "bucket-uri": [],
            "slack-link": [], "api-key": [], "env-unknown": []}
    me = os.path.abspath(__file__)
    for path in files():
        rel = os.path.relpath(path, ROOT)
        scan_self = os.path.abspath(path) == me  # patterns here aren't leaks
        with open(path, encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh, 1):
                where = f"{rel}:{i}"
                if not scan_self:
                    if IMPORT_RE.match(line) and not IMPORT_OK.match(line):
                        hits["nonpublic-import"].append(where)
                    for m in URL_RE.finditer(line):
                        # URL_RE's host class swallows sentence punctuation
                        # ("...see https://spark.apache.org." captures the
                        # final dot); strip trailing [.-] so the END-anchored
                        # allowlist doesn't flag prose (r13 review finding) —
                        # the anti-prefix-trick anchoring is unaffected.
                        if not URL_OK.match(m.group(0).rstrip(".-")):
                            hits["nonpublic-url"].append(where)
                    if BUCKET_RE.search(line):
                        hits["bucket-uri"].append(where)
                    if SLACK_RE.search(line):
                        hits["slack-link"].append(where)
                    if KEY_RE.search(line):
                        hits["api-key"].append(where)
                for m in (list(ENV_SCALA_RE.finditer(line)) +
                          list(ENV_PY_RE.finditer(line))):
                    if not ENV_OK.match(m.group(1)):
                        hits["env-unknown"].append(f"{where} ({m.group(1)})")
    n = sum(len(v) for v in hits.values())
    out = {"round": rnd, "n_hits": n, "hits": hits}
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    for k, v in hits.items():
        for w in v:
            print(f"LEAK {k}: {w}")
    print(f"== leakcheck: {n} hits -> LEAKCHECK.json")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 0))
