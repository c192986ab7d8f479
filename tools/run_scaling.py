"""Scaling-efficiency harness: generate the bench corpus once, zip the
engine for --py-files, run tools/scaling_run.py via spark-submit at
local[8] (N) and local[32] (4N), and report throughput + efficiency.

Usage: python tools/run_scaling.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_zip(dst: Path) -> None:
    with zipfile.ZipFile(dst, "w") as z:
        for p in (REPO / "spaghettisearch_spark").rglob("*"):
            if p.suffix in (".py", ".txt"):
                z.write(p, p.relative_to(REPO))


def ensure_corpus(path: Path, n_docs: int) -> None:
    if path.exists():
        return
    import pandas as pd  # noqa: F401

    from spaghettisearch_spark.fixtures import make_documents

    df = make_documents(n_docs)
    df.to_parquet(path, index=False)


def run(cores: int, corpus: Path, zip_path: Path) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        # local mode: every executor thread lives in the driver JVM —
        # the 1g spark-submit default dies at 32 threads
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "--py-files", str(zip_path),
        str(REPO / "tools" / "scaling_run.py"),
        "--cores", str(cores),
        "--corpus", str(corpus),
    ]
    env = dict(os.environ)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no JSON from cores={cores}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_path = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "SCALING.json"
    corpus = Path(f"/tmp/scaling_corpus_{n_docs}.parquet")
    zip_path = Path("/tmp/engine_pyfiles.zip")
    ensure_corpus(corpus, n_docs)
    make_zip(zip_path)

    r8 = run(8, corpus, zip_path)
    r32 = run(32, corpus, zip_path)
    eff = r32["files_per_sec"] / (4 * r8["files_per_sec"])
    result = {
        "n_docs": n_docs,
        "N": r8,
        "4N": r32,
        "scaling_efficiency": round(eff, 3),
        "criterion": "throughput_4N / (4 * throughput_N) >= 0.8",
        "passed": eff >= 0.8,
    }
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
