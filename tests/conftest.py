import pytest

from threat_intelligence_knowledge_graph_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tikg-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
