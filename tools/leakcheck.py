#!/usr/bin/env python3
"""Dev-only leak scan: greps the repo's shipped sources for anything that
looks like a non-public reference (internal package imports, private
hosts/buckets, chat permalinks, credentials, machine-local env names) and
writes LEAKCHECK.json with scan provenance (commit + timestamp), so the
file provably reflects a fresh scan of the tree it names.

Usage: python3 tools/leakcheck.py [--out LEAKCHECK.json] [--round N]
"""
import argparse, json, re, subprocess, time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# every category maps to (regex, description); hits record file:line:match
PATTERNS = {
    # rooted package imports only: Scala value imports
    # (spark.implicits._, docs.sparkSession...) are not packages, and
    # python stdlib/public-lib imports are covered by the allowlist
    "internal-import": (
        r"^\s*import\s+(?:com|net|io|ai|dev|co|ml)\."
        r"(?!example\b|github\b)[\w.]+",
        "import of a package outside the public/declared dependency set"),
    "internal-url": (
        r"https?://(?!localhost|127\.0\.0\.1|example\.com|www\.w3\.org"
        r"|spark\.apache\.org|github\.com|arxiv\.org|doi\.org)[\w.-]+\.(?:corp|internal|local)\b",
        "URL on a private/corporate-looking host"),
    "internal-pkg2": (
        r"\b(?:com|net|io)\.(?!example\b)[a-z]+\.(?:internal|private|corp)\b",
        "package path with an internal/private/corp segment"),
    "internal-bucket": (
        r"s3a?://[\w.-]+|gs://[\w.-]+|wasbs?://[\w.-]+",
        "object-store bucket reference"),
    "slack-link": (
        r"slack\.com/archives|app\.slack\.com|\bgo/[a-z][\w-]{2,}\b",
        "chat permalink or short-link"),
    "api-key": (
        r"\b(?:AKIA[0-9A-Z]{16}|xox[baprs]-[\w-]{10,}|sk-[A-Za-z0-9]{20,}"
        r"|ghp_[A-Za-z0-9]{30,}|AIza[\w-]{35})\b",
        "credential-shaped token"),
    "axon-env": (
        r"\b[A-Z_]*(?:AXON|ANTHROPIC|BEDROCK_INTERNAL)[A-Z_]*\b",
        "environment variable naming a non-public system"),
}

SCAN_GLOBS = ["src/**/*.scala", "build.sbt", "project/*.sbt",
              "project/*.scala", "tools/*.py", "Bench.scala", "Verify.scala"]


def git(*args):
    try:
        return subprocess.check_output(["git", *args], cwd=ROOT,
                                       text=True).strip()
    except Exception:
        return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "LEAKCHECK.json"))
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()

    files = sorted({p for g in SCAN_GLOBS for p in ROOT.glob(g)
                    if p.is_file()})
    hits = {cat: [] for cat in PATTERNS}
    for path in files:
        try:
            text = path.read_text(errors="replace")
        except OSError:
            continue
        rel = path.relative_to(ROOT).as_posix()
        if rel == "tools/leakcheck.py":  # the patterns match themselves
            continue
        for cat, (rx, _) in PATTERNS.items():
            for i, line in enumerate(text.splitlines(), 1):
                m = re.search(rx, line)
                if m:
                    # generic doc-placeholder authorities (the
                    # object-store contract's scaladoc examples) are
                    # not references to any real bucket
                    if cat == "internal-bucket" and re.match(
                            r"\w+://(bucket|corpus|example|my-bucket)\b",
                            m.group(0)):
                        continue
                    hits[cat].append(f"{rel}:{i}:{m.group(0)[:80]}")

    out = {
        "round": args.round,
        "scanned_files": len(files),
        "scan_commit": git("rev-parse", "HEAD"),
        "scan_time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"scanned {len(files)} files, {out['n_hits']} hits "
          f"-> {args.out}")
    for cat, rows in hits.items():
        for r in rows:
            print(f"  {cat}: {r}")


if __name__ == "__main__":
    main()
