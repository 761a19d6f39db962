import faulthandler
import os
import signal
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hang diagnosis: `kill -USR1 <pytest pid>` dumps every thread's Python
# stack to stderr without killing the run. The suite intermittently stalls
# on this box when a fresh Ray session starts amid leftover Ray daemons
# (see CLAUDE.md: pre-clean `ray::`/raylet/gcs_server before suite runs).
try:
    faulthandler.register(signal.SIGUSR1, all_threads=True)
except (AttributeError, ValueError):  # platform without SIGUSR1 / non-main thread
    pass


@pytest.fixture(scope="session")
def ray_session():
    import ray

    # 6 CPUs, not 4: the suite intermittently DEADLOCKED at 4 — a query's
    # 2-actor pool plus one not-yet-torn-down actor from the previous test
    # plus the sort's boundary-sampling task can pin every slot (caught via
    # the SIGUSR1 stack dump: sample_boundaries ray.wait never returning
    # while 3 idle workers hold the CPUs). Two spare slots make that
    # transient overlap schedulable; pool_size() still caps pools at 4.
    ray.init(
        address="local",
        num_cpus=6,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
