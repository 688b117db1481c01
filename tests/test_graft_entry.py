"""Driver-contract test: dryrun_multichip runs BOTH model families sharded.

Executes the in-process path on the 8-device virtual CPU mesh (the same
environment the driver's subprocess bootstrap creates): CSNet full train
step on the 2-D data x spatial mesh, plus the (unconditional) CSF+Res2Net
micro-step with its batch sharded data x spatial over the same mesh
(SURVEY section 5.8 obligation).
"""

import sys


def test_dryrun_multichip_covers_both_families(capsys):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "mesh={'data': 4, 'spatial': 2}" in out
    assert "sharded over 8 devices" in out
    assert "resident epoch(8)" in out
    assert "CSF+res2net50(8, data x spatial)" in out
    assert "CSF+res2net101(8, data x spatial)" in out
