"""Setuptools shim for offline editable installs.

Metadata lives in pyproject.toml (PEP 621); this file exists because
PEP 660 editable wheels need the `wheel` package and (with build
isolation) network access — the legacy `setup.py develop` path needs
neither.  `pip install -e .` routes through here automatically when
pyproject.toml has no [build-system] table."""

from setuptools import setup

setup()
