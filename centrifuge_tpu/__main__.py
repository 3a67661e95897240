"""Dispatch: python -m centrifuge_tpu <tool> [args...]

Tools: classify (default), build, inspect, kreport, download, promote.
"""

import sys

_TOOLS = {
    "classify": ("centrifuge_tpu.cli.classify", "run"),
    "build": ("centrifuge_tpu.cli.build_cli", "run"),
    "inspect": ("centrifuge_tpu.cli.inspect_cli", "run"),
    "kreport": ("centrifuge_tpu.cli.kreport_cli", "run"),
    "download": ("centrifuge_tpu.cli.download_cli", "run"),
    "promote": ("centrifuge_tpu.cli.promote_cli", "run"),
    "simulate": ("centrifuge_tpu.cli.eval_cli", "run_simulate"),
    "evaluate": ("centrifuge_tpu.cli.eval_cli", "run_evaluate"),
}


def main() -> None:
    argv = sys.argv[1:]
    tool = "classify"
    if argv and argv[0] in _TOOLS:
        tool = argv[0]
        argv = argv[1:]
    import importlib
    mod_name, fn = _TOOLS[tool]
    mod = importlib.import_module(mod_name)
    sys.exit(getattr(mod, fn)(argv))


if __name__ == "__main__":
    main()
