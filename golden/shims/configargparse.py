"""Minimal configargparse shim — just enough for the reference's opt.py.

The real `configargparse` pip package is not installed in this environment;
the reference's `config_parser` (reference: opt.py:6-242) only uses:
  * ArgumentParser()
  * add_argument(..., is_config_file=True) for exactly one --config flag
  * flat `key = value` config files with `[a, b, c]` lists and `#` comments
  * CLI args overriding config-file values

This shim pre-expands the config file into CLI tokens placed *before* the
real CLI args so argparse's last-wins behavior reproduces configargparse's
override order. `action="append"` flags (n_lamb_sigma, upsamp_list, ...)
receive one token pair per list element.
"""

import argparse
import sys


def _split_list(text):
    inner = text.strip()[1:-1]
    return [tok.strip() for tok in inner.split(",") if tok.strip()]


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *a, **kw):
        kw.pop("default_config_files", None)
        super().__init__(*a, **kw)
        self._config_flag_names = []
        self._append_dests = set()

    def add_argument(self, *names, **kw):
        if kw.pop("is_config_file", False):
            self._config_flag_names.extend(n for n in names if n.startswith("--"))
            kw.setdefault("type", str)
        if kw.get("action") == "append":
            for n in names:
                if n.startswith("--"):
                    self._append_dests.add(n.lstrip("-"))
        return super().add_argument(*names, **kw)

    def _config_tokens(self, path):
        tokens = []
        with open(path) as fh:
            for raw in fh:
                line = raw.split("#", 1)[0].strip()
                if not line or "=" not in line:
                    continue
                key, value = (part.strip() for part in line.split("=", 1))
                flag = f"--{key}"
                if value.startswith("[") and value.endswith("]"):
                    for item in _split_list(value):
                        tokens += [flag, item]
                else:
                    tokens += [flag, value]
        return tokens

    def parse_args(self, args=None, namespace=None):
        argv = list(sys.argv[1:] if args is None else args)
        expanded = []
        i = 0
        config_path = None
        while i < len(argv):
            if argv[i] in self._config_flag_names and i + 1 < len(argv):
                config_path = argv[i + 1]
                i += 2
                continue
            expanded.append(argv[i])
            i += 1
        if config_path is not None:
            cfg_tokens = self._config_tokens(config_path)
            # CLI overrides config: for append-dests drop config tokens that
            # the CLI also sets (append would otherwise concatenate them).
            cli_flags = {tok.lstrip("-") for tok in expanded if tok.startswith("--")}
            filtered = []
            skip_next = False
            for j, tok in enumerate(cfg_tokens):
                if skip_next:
                    skip_next = False
                    continue
                name = tok.lstrip("-")
                if tok.startswith("--") and name in self._append_dests and name in cli_flags:
                    skip_next = True
                    continue
                filtered.append(tok)
            expanded = filtered + expanded
        ns = super().parse_args(expanded, namespace)
        if config_path is not None and hasattr(ns, "config"):
            ns.config = config_path
        return ns
