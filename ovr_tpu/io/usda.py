"""USDA scene-settings reader.

The reference's optional USD serializer (`ovr/serializer/serializer_usda.cpp`,
behind OVR_BUILD_SCENE_USD) reads a small USDA overlay like
`data/scene_setting.usda`: rendering flags, a `data_path` pointing at a JSON
scene, and camera/light overrides. This is a dependency-free parser for that
subset of the USDA text format (typed attributes `int/bool/float/float3/
string` inside nested `def "name" { ... }` scopes, `#` comments), plus
`create_scene_usda` which loads the referenced JSON scene and applies the
overrides.
"""

from __future__ import annotations

import os
import re
from typing import Any

_TOKEN = re.compile(
    r'"(?:[^"\\]|\\.)*"'      # quoted string
    r"|[{}()=,]"              # punctuation
    r"|[^\s{}()=,\"]+"        # bare word / number
)


def _tokenize(text: str) -> list[str]:
    out = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        out.extend(_TOKEN.findall(line))
    return out


def _parse_value(toks: list[str], i: int) -> tuple[Any, int]:
    t = toks[i]
    if t == "(":  # tuple of numbers
        vals = []
        i += 1
        while toks[i] != ")":
            if toks[i] == ",":
                i += 1
                continue
            vals.append(float(toks[i]))
            i += 1
        return tuple(vals), i + 1
    if t.startswith('"'):
        return t[1:-1], i + 1
    low = t.lower()
    if low in ("true", "false"):
        return low == "true", i + 1
    try:
        return int(t), i + 1
    except ValueError:
        try:
            return float(t), i + 1
        except ValueError:
            return t, i + 1


_TYPES = {"int", "bool", "float", "double", "float3", "double3", "string",
          "token", "int3"}


def _parse_scope(toks: list[str], i: int) -> tuple[dict, int]:
    """Parse `{ ... }` starting at the `{` token; returns (dict, next_i)."""
    assert toks[i] == "{", toks[i]
    i += 1
    scope: dict[str, Any] = {}
    while toks[i] != "}":
        if toks[i] == "def":
            # def [Type] "name" { ... }
            i += 1
            if not toks[i].startswith('"'):
                i += 1  # optional prim type
            name = toks[i][1:-1]
            i += 1
            sub, i = _parse_scope(toks, i)
            scope[name] = sub
        elif toks[i] in _TYPES:
            i += 1  # attribute type keyword
            name = toks[i]
            i += 1
            assert toks[i] == "=", f"expected '=' after {name}"
            val, i = _parse_value(toks, i + 1)
            scope[name] = val
        else:  # untyped `name = value`
            name = toks[i]
            i += 1
            assert toks[i] == "=", f"unexpected token {name!r}"
            val, i = _parse_value(toks, i + 1)
            scope[name] = val
    return scope, i + 1


def parse_usda(text: str) -> dict:
    """Parse a USDA document (the settings subset) into nested dicts."""
    toks = _tokenize(text)
    if toks and toks[0] == "#usda":  # magic may survive comment stripping
        toks = toks[2:]
    root: dict[str, Any] = {}
    i = 0
    while i < len(toks):
        if toks[i] == "def":
            i += 1
            if not toks[i].startswith('"'):
                i += 1
            name = toks[i][1:-1]
            i += 1
            sub, i = _parse_scope(toks, i)
            root[name] = sub
        else:
            i += 1
    return root


def create_scene_usda(filename: str):
    """Load a USDA settings file: resolve its volume.data_path JSON scene,
    then apply camera and light overrides (serializer_usda.cpp semantics).

    Returns (scene, settings_dict); settings_dict carries the `rendering`
    flags (use_dda, parallel_view, simple_path_tracing) for the caller.
    """
    import dataclasses

    from ovr_tpu.core.scene import Camera, Light
    from ovr_tpu.io.vidi3d import create_scene

    with open(filename) as f:
        doc = parse_usda(f.read())
    sc = doc.get("scene", doc)
    vol = sc.get("volume", {})
    data_path = vol.get("data_path")
    if not data_path:
        raise ValueError(f"{filename}: no scene.volume.data_path")
    if not os.path.isabs(data_path):
        data_path = os.path.join(os.path.dirname(filename) or ".", data_path)
    scene = create_scene(data_path)

    cam = sc.get("camera")
    if cam and all(k in cam for k in ("from", "at", "up")):
        old = scene.camera
        scene = dataclasses.replace(scene, camera=Camera.create(
            from_=cam["from"], at=cam["at"], up=cam["up"],
            fovy=old.fovy, height=old.height, kind=old.kind))

    light = sc.get("light", {})
    directional = light.get("directional", {})
    ambient = light.get("ambient", {})
    first_dir = next(iter(directional.values()), None)
    first_amb = next(iter(ambient.values()), None)
    if first_dir or first_amb:
        direction = scene.light.direction
        color = scene.light.color
        amb = scene.light.ambient
        if first_dir:
            d = first_dir.get("direction")
            if d is not None:
                # USD lights point *along* `direction`; our Light.direction
                # points *toward* the light
                direction = tuple(-x for x in d)
            c = first_dir.get("color")
            k = float(first_dir.get("intensity", 1.0))
            if c is not None:
                color = tuple(x * k for x in c)
        if first_amb:
            amb = float(first_amb.get("intensity", 1.0))
        scene = dataclasses.replace(scene, light=Light.create(
            direction=direction, color=color, ambient=amb))

    return scene, sc.get("rendering", {})
