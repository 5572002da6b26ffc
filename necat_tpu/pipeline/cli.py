"""Command-line interface — necat.pl compatible commands.

  python -m necat_tpu.pipeline.cli config   <cfg>   # write a config template
  python -m necat_tpu.pipeline.cli correct  <cfg>   # correct raw reads
  python -m necat_tpu.pipeline.cli assemble <cfg>   # correct + trim + assemble [+ polish]
  python -m necat_tpu.pipeline.cli bridge   <cfg>   # assemble + bridge [+ polish]

(reference: necat.pl cmdCorrect/cmdAssemble/cmdBridge, :1503-1598)
"""

from __future__ import annotations

import sys

from necat_tpu.pipeline import config as config_mod
from necat_tpu.utils.device import setup_runtime
from necat_tpu.pipeline.stages import Project
from necat_tpu.utils.logging import logger


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 1
    cmd, cfg_path = argv[0], argv[1]
    if cmd == "config":
        config_mod.write_template(cfg_path)
        print(f"wrote config template to {cfg_path}")
        return 0
    setup_runtime()
    cfg = config_mod.load_config(cfg_path)
    prj = Project(cfg, cfg.project)
    if cmd == "correct":
        out = prj.run_correct()
    elif cmd == "assemble":
        out = prj.run_assemble()
        if cfg.polish:
            out = prj.run_polish(out, "final")
    elif cmd == "bridge":
        out = prj.run_bridge()
        if cfg.polish:
            out = prj.run_polish(out, "final")
    else:
        print(f"unknown command {cmd!r}")
        return 1
    if cfg.get("CLEANUP", "0") in ("1", "true"):
        prj.cleanup()
    logger.info("final output: %s", out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
