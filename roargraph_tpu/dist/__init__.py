from .sharded import (ShardedRoarGraph, ShardedTileIndex,  # noqa
                      build_sharded, build_sharded_tiles, make_mesh,
                      make_mesh2, sharded_knn, sharded_phase_b_program,
                      sharded_search, sharded_search_2level,
                      sharded_tile_search)
