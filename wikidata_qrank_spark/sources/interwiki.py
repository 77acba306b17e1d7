"""Interwiki-map parser — S8 semantics (wikisites.go:215-271).

The live map is a PHP snippet of ``'key' => 'value'`` pairs fetched from
noc.wikimedia.org (driver-side HTTP at job setup; here the text is
passed in). Parsing rules:

* ``__sites:<wiki>`` entries map a wiki key to its project name;
* other entries are kept only when the value starts with ``"1 "`` (an
  intra-Wikimedia link) and its URL path is exactly ``/wiki/$1`` — the
  hostname becomes the target domain;
* duplicate keys: last entry wins (live file has ~146 conflicting
  duplicates — wikisites.go:241-263).

``build_scoped_maps`` reshapes the flat map into the (scope, prefix) →
wiki-key dict used by operators.wiki.interwiki_links — scopes are
``<wiki>`` (local, from ``<wiki>:prefix`` keys), ``_<project>``
(project-language, derived from ``__sites``) and ``__global``.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

_PAIR = re.compile(r"'(.+?)' => '(.+?)'")


def parse_interwiki_php(text: str) -> dict[str, str]:
    """Flat map: key → project (for __sites keys) or target hostname."""
    result: dict[str, str] = {}
    for m in _PAIR.finditer(text):
        key, value = m.group(1), m.group(2)
        if key.startswith("__sites:"):
            result[key] = value
            continue
        if not value.startswith("1 "):
            continue
        u = urlparse(value[2:])
        if u.path == "/wiki/$1":
            result[key] = u.hostname or ""
    return result


def build_scoped_maps(
    flat: dict[str, str], domains_to_wiki: dict[str, str]
) -> tuple[dict[tuple[str, str], str], dict[str, str]]:
    """((scope, prefix) → wiki key, wiki key → project).

    Only targets whose domain belongs to a known wiki (``domains_to_
    wiki``: domain → wiki key, from the sites table) are resolvable —
    the reference drops prefixes pointing at wikis without dumps.
    """
    projects: dict[str, str] = {}
    for key, value in flat.items():
        if key.startswith("__sites:"):
            projects[key[len("__sites:"):]] = value

    scoped: dict[tuple[str, str], str] = {}
    for key, domain in flat.items():
        if key.startswith("__sites:"):
            continue
        wiki = domains_to_wiki.get(domain)
        if wiki is None:
            continue
        if key.startswith("__global:"):
            scoped[("__global", key[len("__global:"):])] = wiki
        elif ":" in key:
            owner, prefix = key.split(":", 1)
            scoped[(owner, prefix)] = wiki
    # project-language scopes: '_<project>:<lang-ish wiki prefix>' — the
    # reference derives them from __sites entries of known wikis: a wiki
    # '<lang><project>' gives prefix '<lang>' in scope '_<project>'
    for wiki, project in projects.items():
        if wiki in domains_to_wiki.values():
            suffix = "wiki" if project == "wiki" else project
            if wiki.endswith(suffix):
                lang = wiki[: -len(suffix)]
                if lang:
                    scoped[("_" + project, lang)] = wiki
    return scoped, projects
