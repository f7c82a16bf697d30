"""Dotted/indexed attribute access (reference
deepchem/utils/attribute_utils.py): get/set/delete nested attributes
addressed as ``"alpha.params[1]"`` — attribute hops separated by dots,
dict/list hops in brackets.
"""

from __future__ import annotations

import ast
import re
from typing import Any, List

__all__ = ['get_attr', 'set_attr', 'del_attr']

_NAME_PATTERN = re.compile(r'\[[^\[\]]*\]|[^.\[\]]+')


def _preproc_name(name: str) -> List[str]:
    """Split a composite name into hops.

    >>> _preproc_name('alpha.params[1]')
    ['alpha', 'params', '[1]']
    """
    return _NAME_PATTERN.findall(name)


def _apply(obj, hop: str, mode: str, val=None):
    if hop.startswith('['):
        key = ast.literal_eval(hop[1:-1])
        if mode == 'get':
            return obj[key]
        if mode == 'set':
            obj[key] = val
            return None
        del obj[key]
        return None
    if mode == 'get':
        return getattr(obj, hop)
    if mode == 'set':
        setattr(obj, hop, val)
        return None
    delattr(obj, hop)
    return None


def _resolve_parent(obj, hops: List[str]):
    for hop in hops[:-1]:
        obj = _apply(obj, hop, 'get')
    return obj


def get_attr(obj: object, name: str):
    """Get a (possibly nested) attribute (reference
    attribute_utils.py:15).

    >>> class C:
    ...     pass
    >>> c = C(); c.a = {'x': [10, 20]}
    >>> get_attr(c, 'a[\\'x\\'][1]')
    20
    """
    hops = _preproc_name(name)
    return _apply(_resolve_parent(obj, hops), hops[-1], 'get')


def set_attr(obj: object, name: str, val: Any) -> None:
    """Set a (possibly nested) attribute (reference
    attribute_utils.py:44).

    >>> class C:
    ...     pass
    >>> c = C()
    >>> set_attr(c, 'a', 3); c.a
    3
    """
    hops = _preproc_name(name)
    _apply(_resolve_parent(obj, hops), hops[-1], 'set', val)


def del_attr(obj: object, name: str) -> None:
    """Delete a (possibly nested) attribute (reference
    attribute_utils.py:78)."""
    hops = _preproc_name(name)
    _apply(_resolve_parent(obj, hops), hops[-1], 'del')
