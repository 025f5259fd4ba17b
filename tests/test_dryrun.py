"""The driver's dryrun entry point (in-process; conftest provides the
8-device virtual CPU mesh)."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any failure
