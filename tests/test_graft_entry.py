"""The driver contract: ``__graft_entry__.dryrun_multichip`` must provision
its own n-device mesh (the bench host has ONE real TPU chip).

Under pytest the conftest already forces an 8-device virtual CPU platform, so
``dryrun_multichip(n<=8)`` takes the inline path here; the respawn path (what
the driver actually hits) is covered by checking the child-process env/command
construction with subprocess mocked out.
"""

import sys

import jax
import pytest


def test_dryrun_multichip_inline_path():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    assert len(jax.devices()) >= 2
    g.dryrun_multichip(2)


def test_respawn_env_provisions_virtual_mesh(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    captured = {}

    def fake_run(cmd, env=None, cwd=None, check=None):
        captured.update(cmd=cmd, env=env, cwd=cwd, check=check)

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    # A stale count in XLA_FLAGS must be replaced, not appended to.
    monkeypatch.setenv(
        "XLA_FLAGS", "--foo=1 --xla_force_host_platform_device_count=2"
    )
    g._respawn_on_virtual_cpu_mesh(16)

    flags = captured["env"]["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=16" in flags
    assert "--xla_force_host_platform_device_count=2" not in flags
    assert "--foo=1" in flags
    assert captured["check"] is True
    code = captured["cmd"][-1]
    # The child must select CPU via jax.config BEFORE backend init: the axon
    # sitecustomize ignores the JAX_PLATFORMS env var.
    assert code.index("jax_platforms") < code.index("__graft_entry__")
    assert "dryrun_multichip(16)" in code
