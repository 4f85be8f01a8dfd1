"""Package version (role of reference ``trieste/version.py``: the reference reads a
repo-root VERSION file; here the version is inline — there is no separate file to
track)."""

VERSION = "0.3.0"
"""Round-versioned: 0.<round>.x."""

__version__ = VERSION
