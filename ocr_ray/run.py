"""CLI driver: ``python -m ocr_ray.run --config pipeline.yaml``.

The ``ray job submit`` entry point mandated by the north rule — the
analogue of the reference's bootstrap ``main``
(``/root/reference/src/driver/ocr-driver.c:279-303``): parse config, bring
up the session, build the user DAG, run to quiescence, tear down.

Owns its Ray session (guarded — a pre-initialised cluster session from
``ray job submit`` is reused as-is). A killed run re-invoked with the same
config resumes: fragments already committed to the output manifest are
skipped at the read (``ocr_ray.state.manifest``).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="ocr_ray pipeline runner")
    p.add_argument("--config", help="YAML/JSON pipeline spec")
    p.add_argument("--num-cpus", type=int, default=None, help="local session size")
    p.add_argument("--list-stages", action="store_true", help="print registry and exit")
    args = p.parse_args(argv)

    if args.list_stages:
        from ocr_ray.registry import list_stages

        for name, desc in list_stages().items():
            print(f"{name:24s} {desc}")
        return 0
    if not args.config:
        p.error("--config is required (or use --list-stages)")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ocr_ray.pipelines.builder import load_spec, run_pipeline

        summary = run_pipeline(load_spec(args.config))
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
