from .basic import BenchNet, load_basic_data, load_large_data, make_bench_input
