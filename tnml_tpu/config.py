"""Input-file configuration, compatible with the reference's ITensor InputGroup format.

The reference drives every app with a text file of the form (sample_inputs/input_fixedL:1-19)::

    input
    {
    datadir = /path/to/MNIST
    Ntrain = 100
    cutoff = 1E-12
    maxm = 40
    }

``read_input_file`` parses that format (group name, braces, ``key = value`` lines,
``//`` and ``#`` comments).  ``Config`` is a typed accessor mirroring ITensor's
``InputGroup.getInt/getReal/getString/getYesNo`` (fixedL.cc:584-608, single.cc:16-51),
including the reference's defaulting rules (e.g. ``minm`` defaults to ``max(10, maxm//2)``,
fixedL.cc:593).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


class ConfigError(ValueError):
    pass


def _strip_comment(line: str) -> str:
    for marker in ("//", "#"):
        idx = line.find(marker)
        if idx >= 0:
            line = line[:idx]
    return line.strip()


def parse_input_text(text: str, group: str = "input") -> Dict[str, str]:
    """Parse ITensor-InputGroup-style text and return the raw key->string map."""
    lines = [_strip_comment(l) for l in text.splitlines()]
    lines = [l for l in lines if l]

    # Find the group header; tolerate "input {" on one line or brace on next line.
    body_lines = []
    in_group = False
    depth = 0
    for raw in lines:
        line = raw
        if not in_group:
            m = re.match(rf"^{re.escape(group)}\b(.*)$", line)
            if m:
                in_group = True
                line = m.group(1).strip()
                if not line:
                    continue
            else:
                continue
        # Inside (or on the remainder of) the group header line.
        while line:
            if not depth:
                if line.startswith("{"):
                    depth = 1
                    line = line[1:].strip()
                    continue
                break
            if line.endswith("}"):
                line = line[:-1].strip()
                depth = 0
                if line:
                    body_lines.append(line)
                break
            body_lines.append(line)
            line = ""
        if in_group and depth == 0 and body_lines:
            break

    if not in_group:
        raise ConfigError(f"input group '{group}' not found")

    values: Dict[str, str] = {}
    for line in body_lines:
        if "=" not in line:
            raise ConfigError(f"malformed input line (expected key = value): {line!r}")
        key, _, val = line.partition("=")
        values[key.strip()] = val.strip()
    return values


def read_input_file(path: str, group: str = "input") -> "Config":
    with open(path) as f:
        return Config(parse_input_text(f.read(), group), source=path)


_YES = {"yes", "true", "1", "y"}
_NO = {"no", "false", "0", "n"}


@dataclass
class Config:
    """Typed view over a parsed input group; also usable as a plain kwargs bag.

    Mirrors ITensor InputGroup accessors and doubles as the reference's ``Args``
    key-value bag (fixedL.cc:751-759).
    """

    values: Dict[str, Any] = field(default_factory=dict)
    source: Optional[str] = None

    def __contains__(self, key: str) -> bool:
        return key in self.values

    def get_int(self, key: str, default: Optional[int] = None) -> int:
        if key in self.values:
            return int(float(str(self.values[key])))
        if default is None:
            raise ConfigError(f"missing required int parameter '{key}'")
        return int(default)

    def get_real(self, key: str, default: Optional[float] = None) -> float:
        if key in self.values:
            return float(str(self.values[key]))
        if default is None:
            raise ConfigError(f"missing required real parameter '{key}'")
        return float(default)

    def get_string(self, key: str, default: Optional[str] = None) -> str:
        if key in self.values:
            return str(self.values[key])
        if default is None:
            raise ConfigError(f"missing required string parameter '{key}'")
        return default

    def get_yesno(self, key: str, default: Optional[bool] = None) -> bool:
        if key in self.values:
            v = str(self.values[key]).strip().lower()
            if v in _YES:
                return True
            if v in _NO:
                return False
            raise ConfigError(f"parameter '{key}' expected yes/no, got {v!r}")
        if default is None:
            raise ConfigError(f"missing required yes/no parameter '{key}'")
        return bool(default)

    def add(self, key: str, value: Any) -> None:
        self.values[key] = value

    def copy_with(self, **kwargs: Any) -> "Config":
        merged = dict(self.values)
        merged.update(kwargs)
        return Config(merged, source=self.source)
