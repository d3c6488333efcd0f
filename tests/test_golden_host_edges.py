from golden_util import golden_suite

test_host_edges = golden_suite("host_edges.json")
