"""Convention drift guard (VERDICT r2 item 6).

echopype_tpu/echodata/convention.py is a hand transcription of the
reference's SONAR-netCDF4 schema (echodata/convention/1.0.yml).  This test
parses the YAML with a ~60-line subset reader and asserts the transcription
matches — a semantic change to the reference YAML fails CI here.
"""

import re

import numpy as np

from echopype_tpu.echodata.convention import GROUP_MAP, VARATTRS

YAML_PATH = "/root/reference/echopype/echodata/convention/1.0.yml"


def parse_yaml_subset(text: str):
    """Parse the maps/scalars/folded-scalars subset used by 1.0.yml."""
    root: dict = {}
    # stack of (indent, container)
    stack = [(-1, root)]
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        raw = lines[i]
        i += 1
        stripped = raw.split("#", 1)[0].rstrip() if not raw.lstrip().startswith("#") else ""
        if not stripped.strip():
            continue
        indent = len(raw) - len(raw.lstrip())
        while stack and indent <= stack[-1][0]:
            stack.pop()
        container = stack[-1][1]
        m = re.match(r"([^:]+):\s*(.*)$", raw.strip())
        if not m:
            continue
        key, val = m.group(1).strip(), m.group(2).strip()
        if val == ">-" or val == ">":
            # folded block scalar: consume deeper-indented lines
            parts = []
            while i < len(lines):
                nxt = lines[i]
                if nxt.strip() and (len(nxt) - len(nxt.lstrip())) <= indent:
                    break
                if nxt.strip():
                    parts.append(nxt.strip())
                i += 1
            container[key] = " ".join(parts)
        elif val == "":
            # either an empty value or a nested map: decide by peeking
            child: dict = {}
            if i < len(lines):
                j = i
                while j < len(lines) and not lines[j].strip():
                    j += 1
                if j < len(lines) and (len(lines[j]) - len(lines[j].lstrip())) > indent:
                    container[key] = child
                    stack.append((indent, child))
                    continue
            container[key] = None
        else:
            if val.startswith('"') and val.endswith('"'):
                val = val[1:-1]
            elif val.startswith("'") and val.endswith("'"):
                val = val[1:-1]
            container[key] = val
    return root


def _yaml():
    with open(YAML_PATH) as f:
        return parse_yaml_subset(f.read())


class TestGroupMapDrift:
    def test_group_keys_match(self):
        ref = _yaml()["groups"]
        assert set(GROUP_MAP) == set(ref), (
            f"group keys drifted: ours-only={set(GROUP_MAP) - set(ref)}, "
            f"yaml-only={set(ref) - set(GROUP_MAP)}"
        )

    def test_names_and_paths_match(self):
        ref = _yaml()["groups"]
        for key, ours in GROUP_MAP.items():
            assert ours["name"] == ref[key]["name"], key
            ref_ep = ref[key].get("ep_group")
            ours_ep = ours["ep_group"]
            assert (ours_ep or None) == (ref_ep or None), key

    def test_descriptions_match(self):
        ref = _yaml()["groups"]
        for key, ours in GROUP_MAP.items():
            want = ref[key].get("description") or ""
            assert ours["description"] == want, (
                f"{key}: {ours['description']!r} != {want!r}"
            )


class TestVarattrsDrift:
    def test_transcribed_attrs_match_yaml(self):
        """Every (section, var, attr) we transcribe must equal the YAML's."""
        ref = _yaml()["variable_and_varattributes"]
        checked = 0
        for section, vars_ in VARATTRS.items():
            if section not in ref:
                continue
            for var, attrs in vars_.items():
                if not isinstance(attrs, dict) or var not in ref[section]:
                    continue
                for attr, val in attrs.items():
                    ref_val = (ref[section] or {}).get(var, {})
                    if not isinstance(ref_val, dict) or attr not in ref_val:
                        continue
                    want = ref_val[attr]
                    if isinstance(val, (int, float)) and not isinstance(val, bool):
                        assert np.isclose(float(want), float(val)), (
                            section, var, attr, want, val
                        )
                    else:
                        assert str(val) == str(want), (section, var, attr, want, val)
                    checked += 1
        assert checked >= 10, f"only {checked} attrs compared; parser or VARATTRS broken?"

    def test_yaml_header(self):
        top = _yaml()
        assert top["version"] == "1.0"
        assert top["name"].startswith("The SONAR-netCDF4 convention")
