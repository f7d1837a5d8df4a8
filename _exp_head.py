from bench import bench_sparse_epoch
for kw in (
    dict(batch_size=8192, hybrid=True, max_head=16384, coverage=0.98, sampling="block"),
    dict(batch_size=4096, hybrid=True, max_head=8192,  coverage=0.95, sampling="block"),
    dict(batch_size=8192, hybrid=True, max_head=8192,  coverage=0.95, sampling="block", scan_unroll=2),
):
    try:
        bench_sparse_epoch(**kw)
    except Exception as e:
        print("failed:", kw, e)
