"""Dispatch: python -m centrifuge_tpu <tool> [args...]

Tools: classify (default), build, inspect, kreport, download, promote.
"""

import sys

_TOOLS = {
    "classify": "centrifuge_tpu.cli.classify",
    "build": "centrifuge_tpu.cli.build_cli",
    "inspect": "centrifuge_tpu.cli.inspect_cli",
    "kreport": "centrifuge_tpu.cli.kreport_cli",
    "download": "centrifuge_tpu.cli.download_cli",
    "promote": "centrifuge_tpu.cli.promote_cli",
}


def main() -> None:
    argv = sys.argv[1:]
    tool = "classify"
    if argv and argv[0] in _TOOLS:
        tool = argv[0]
        argv = argv[1:]
    import importlib
    mod = importlib.import_module(_TOOLS[tool])
    sys.exit(mod.run(argv))


if __name__ == "__main__":
    main()
