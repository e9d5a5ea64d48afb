"""spark-submit packaging (north rule: "runs via spark-submit
--py-files at N and 4N executors").

``build_pyfiles_zip`` zips the package for --py-files;
``submit_command`` renders the full command for a cluster run — on the
sandbox the master is local[N], on a real cluster the same command
takes yarn/k8s master + executor counts.
"""

from __future__ import annotations

import os
import zipfile

PACKAGE = "mapnik_vector_tile_spark"


def build_pyfiles_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pkg_dir = os.path.join(root, PACKAGE)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in base:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(base, f)
                zf.write(full, os.path.relpath(full, root))
    return out_path


def submit_command(
    job_script: str,
    pyfiles_zip: str,
    master: str = "local[8]",
    executors: int | None = None,
    executor_cores: int = 4,
    executor_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> list[str]:
    cmd = [
        "spark-submit",
        "--master", master,
        "--py-files", pyfiles_zip,
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
    ]
    if executors is not None:  # cluster mode (yarn/k8s)
        cmd += [
            "--num-executors", str(executors),
            "--executor-cores", str(executor_cores),
            "--executor-memory", executor_memory,
        ]
    for k, v in (extra_conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    cmd.append(job_script)
    return cmd
