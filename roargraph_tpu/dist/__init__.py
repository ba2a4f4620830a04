from .sharded import (ShardedRoarGraph, build_sharded, make_mesh,  # noqa
                      make_mesh2, sharded_knn, sharded_phase_b_program,
                      sharded_search, sharded_search_2level)
