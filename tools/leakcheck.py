#!/usr/bin/env python3
"""Repo-side leak scan, stamped so the artifact proves it ran.

ADVICE_r9: LEAKCHECK.json's only change round-over-round was the round
number — indistinguishable from a hand-edit. This tool re-runs the scan
over src/ and tools/ and stamps the scanned COMMIT HASH and FILE COUNT
into the JSON, so a fresh record provably corresponds to a fresh scan
of a specific tree.

Categories mirror the driver's seven (empty = clean):
  internal-import  — imports outside the public allowlist
                     (org.apache.spark / scala / java / graft / javax)
  internal-url     — http(s) URLs whose host is not a public code/doc
                     host (github, apache, wikipedia, ietf, w3, python,
                     duckdb, spark, scala-lang, localhost/example.com
                     test fixtures)
  internal-pkg2    — package declarations outside graft / the
                     documented org.apache.spark.sql.graftbridge seam
  internal-bucket  — object-store URIs (s3:// s3a:// gs:// abfss://)
  slack-link       — slack.com links or slack:// deep links
  api-key          — AWS-style key ids or inline key/secret/token
                     literals
  axon-env         — env-var reads outside the SPARK_GRAFT_* /
                     CHECK_ORACLE_* namespaces this repo defines

Exit 0 = no hits; exit 1 = hits (listed, and written to the JSON).
"""
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PUBLIC_HOSTS = re.compile(
    r"(github\.com|apache\.org|wikipedia\.org|wikimedia\.org|ietf\.org|"
    r"w3\.org|python\.org|duckdb\.org|spark\.apache\.org|scala-lang\.org|"
    r"example\.(com|org)|localhost|127\.0\.0\.1)")
# Only fully-qualified reverse-domain imports can name a proprietary
# package; relative Scala imports (spark.implicits._, Exprs._) and
# Python stdlib imports cannot, so the check fires only on a dotted
# com./net./io./ai./co./dev./me. root outside the public allowlist.
REVERSE_DOMAIN = re.compile(
    r"^\s*(?:import|from)\s+((?:com|net|io|ai|co|dev|me)\.[\w.]+)")
IMPORT_ALLOW = re.compile(
    r"^(com\.(google|fasterxml|github|typesafe)|io\.(netty|dropwizard)|"
    r"net\.(razorvine|sf))\.")
PKG_ALLOW = re.compile(
    r"^\s*package\s+(graft(\.|$)|org\.apache\.spark\.sql\.graftbridge)")
ENV_ALLOW = re.compile(
    r"SPARK_GRAFT_[A-Z0-9_]*|CHECK_ORACLE_[A-Z0-9_]*|SF100_VERIFY_OUT|"
    r"SF10_[A-Z0-9_]*|OVERRIDE_EQUIV_[A-Z0-9_]*|"
    r"COURSIER_[A-Z0-9_]*|JAVA_HOME|PATH|HOME|TMPDIR")

CHECKS = {
    "internal-import": lambda ln: (
        (m := REVERSE_DOMAIN.match(ln)) is not None
        and not IMPORT_ALLOW.match(m.group(1))),
    "internal-url": lambda ln: (
        re.search(r"https?://", ln) is not None
        and not PUBLIC_HOSTS.search(ln)),
    "internal-pkg2": lambda ln: (
        ln.lstrip().startswith("package ") and not PKG_ALLOW.match(ln)),
    "internal-bucket": lambda ln: (
        re.search(r"\b(s3a?|gs|abfss|wasbs?)://", ln) is not None),
    "slack-link": lambda ln: (
        re.search(r"slack\.com|slack://", ln) is not None),
    "api-key": lambda ln: (
        re.search(r"\bAKIA[0-9A-Z]{16}\b", ln) is not None
        or re.search(
            r"(?i)(api[_-]?key|secret|token)\s*[:=]\s*['\"][A-Za-z0-9/_+=-]{20,}['\"]",
            ln) is not None),
    "axon-env": lambda ln: any(
        not ENV_ALLOW.fullmatch(m)
        for m in re.findall(
            r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"([A-Z0-9_]+)\"", ln)
        + re.findall(r"os\.environ(?:\.get)?\[?\(?\s*[\"']([A-Z0-9_]+)", ln)),
}


def main() -> int:
    try:
        commit = subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        commit = "unknown"

    hits = {cat: [] for cat in CHECKS}
    n_files = 0
    for base in ("src", "tools"):
        for dirpath, _, files in os.walk(os.path.join(ROOT, base)):
            for fname in sorted(files):
                if not fname.endswith((".scala", ".py", ".sh", ".sbt")):
                    continue
                path = os.path.join(dirpath, fname)
                rel = os.path.relpath(path, ROOT)
                if rel == os.path.join("tools", "leakcheck.py"):
                    continue  # the patterns themselves are not leaks
                n_files += 1
                try:
                    lines = open(path, encoding="utf-8",
                                 errors="replace").read().splitlines()
                except OSError:
                    continue
                for i, ln in enumerate(lines, 1):
                    for cat, pred in CHECKS.items():
                        if pred(ln):
                            hits[cat].append(f"{rel}:{i}: {ln.strip()[:160]}")

    n_hits = sum(len(v) for v in hits.values())
    out = {
        "commit": commit,
        "n_files_scanned": n_files,
        "n_hits": n_hits,
        "hits": hits,
    }
    out_path = os.path.join(ROOT, "LEAKCHECK_LOCAL.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"scanned {n_files} files at {commit[:12]}: {n_hits} hits "
          f"-> {os.path.basename(out_path)}")
    if n_hits:
        for cat, v in hits.items():
            for h in v:
                print(f" - [{cat}] {h}")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
