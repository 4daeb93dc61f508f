"""URL canonicalization + registered-domain extraction (training-data
pipeline ops, SURVEY.md §2.7 web-text payload: URL-level dedup is the
first dedup pass of every Common-Crawl pipeline, before any content
hashing).

Everything is a single SQL expression rendered for BOTH engines (Spark
and the DuckDB oracle) from one source of truth, so the oracle check is
exact.  No UDFs — scheme/host/path/query splitting is regexp_extract,
tracking-parameter removal is a higher-order array filter, all
JVM-codegen on the Spark side.

Canonical form: lowercase scheme + host, default ports stripped,
leading ``www.`` dropped, trailing slash dropped, ``utm_*`` tracking
parameters removed, fragment removed.
"""

from __future__ import annotations


def _pat(pat: str, dialect: str) -> str:
    """Render a regex for a SQL string literal: Spark's parser treats
    backslash as an escape inside literals, DuckDB's does not."""
    return pat.replace("\\", "\\\\") if dialect == "spark" else pat


def _re_replace(e: str, pat: str, rep: str, dialect: str) -> str:
    """Spark regexp_replace is global; DuckDB needs the 'g' flag."""
    p = _pat(pat, dialect)
    if dialect == "duckdb":
        return f"regexp_replace({e}, '{p}', '{rep}', 'g')"
    return f"regexp_replace({e}, '{p}', '{rep}')"


def raw_url_sql(id_expr: str, dialect: str) -> str:
    """Deterministic messy URL derived from a row id (the documents
    table carries no URL column; like the lon_i/lat_i derivations, both
    engines derive the identical input from doc_id). Mixes case, www,
    default ports, trailing slashes, utm tracking params, fragments."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    i = id_expr
    return (
        "concat("
        f"CASE WHEN {i} % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END, "
        f"CASE WHEN {i} % 2 = 0 THEN 'WWW.' ELSE 'www.' END, "
        f"'site', CAST({i} % 37 AS {s}), "
        f"CASE WHEN {i} % 5 = 0 THEN '.CO.UK' ELSE '.com' END, "
        f"CASE WHEN {i} % 7 = 0 THEN ':443' ELSE '' END, "
        f"'/Path', CAST({i} % 11 AS {s}), "
        f"CASE WHEN {i} % 4 = 0 THEN '/' ELSE '' END, "
        f"CASE WHEN {i} % 6 = 0 THEN concat('?utm_source=x&id=', CAST({i} % 13 AS {s})) "
        f"WHEN {i} % 6 = 3 THEN concat('?id=', CAST({i} % 13 AS {s}), '&utm_campaign=y') "
        "ELSE '' END, "
        f"CASE WHEN {i} % 8 = 0 THEN '#frag' ELSE '' END)"
    )


def host_sql(url: str, dialect: str) -> str:
    """Lowercased host, default port + leading www. stripped. Port
    stripping is scheme-conditional: :443 only for https, :80 only for
    http — 'http://host:443/x' keeps its (non-default) port."""
    hostport = f"lower(regexp_extract({url}, '^[A-Za-z]+://([^/?#]+)', 1))"
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z]+)://', 1))"
    no_443 = _re_replace(hostport, ":443$", "", dialect)
    no_80 = _re_replace(hostport, ":80$", "", dialect)
    no_port = (f"CASE WHEN {scheme} = 'https' THEN {no_443} "
               f"WHEN {scheme} = 'http' THEN {no_80} "
               f"ELSE {hostport} END")
    return _re_replace(no_port, "^www\\.", "", dialect)


def domain_sql(host: str, dialect: str) -> str:
    """Registered domain: last two labels, or three for .co.uk-style
    second-level public suffixes (the subset the synthetic corpus
    uses — a full public-suffix list is a data file, not logic)."""
    p1 = _pat("([^.]+\\.co\\.uk)$", dialect)
    p2 = _pat("([^.]+\\.[^.]+)$", dialect)
    return (
        f"CASE WHEN {host} LIKE '%.co.uk' "
        f"THEN regexp_extract({host}, '{p1}', 1) "
        f"ELSE regexp_extract({host}, '{p2}', 1) END"
    )


def canonical_url_sql(url: str, dialect: str) -> str:
    """Full canonical form (see module docstring)."""
    no_frag = _re_replace(url, "#.*$", "", dialect)
    scheme = f"lower(regexp_extract({no_frag}, '^([A-Za-z]+)://', 1))"
    host = host_sql(no_frag, dialect)
    path_raw = f"regexp_extract({no_frag}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    path = _re_replace(path_raw, "/$", "", dialect)
    qp = _pat("\\?([^#]*)", dialect)
    query = f"regexp_extract({no_frag}, '{qp}', 1)"
    if dialect == "duckdb":
        q_clean = (f"array_to_string(list_filter(string_split({query}, '&'), "
                   f"x -> NOT starts_with(x, 'utm_')), '&')")
    else:
        q_clean = (f"array_join(filter(split({query}, '&'), "
                   f"x -> NOT startswith(x, 'utm_')), '&')")
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {q_clean} <> '' THEN concat('?', {q_clean}) "
        f"ELSE '' END)"
    )
