from .sharded import (ShardedRoarGraph, build_sharded, make_mesh,  # noqa
                      sharded_knn, sharded_search)
