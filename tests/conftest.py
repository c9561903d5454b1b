import pytest

from pds_hw2_mpi_connected_components_spark.plans.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "6g"})
    yield s


def make_edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


class UnionFind:
    """Tiny pure-Python oracle: label = min vertex id per component — the
    reference's exact fixpoint (/root/reference/src/connected_components.c:94-96)."""

    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)

    def labels(self, vertices):
        out = {}
        for v in vertices:
            self.find(v)
        # path-compress to true minimum root
        for v in vertices:
            r = v
            while self.p.get(r, r) != r:
                r = self.p[r]
            out[v] = r
        return out


def cc_oracle(pairs, vertices=None):
    uf = UnionFind()
    vs = set()
    for a, b in pairs:
        uf.union(a, b)
        vs.add(a)
        vs.add(b)
    if vertices:
        vs |= set(vertices)
    return uf.labels(sorted(vs))
