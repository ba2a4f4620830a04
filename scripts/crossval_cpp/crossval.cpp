// Cross-validation driver: exercises the REFERENCE implementation's build,
// index-file save/load, and search paths against artifacts produced by the
// TPU framework (and vice versa). Own code — links against the reference
// sources compiled out-of-tree; no Boost (see shim/), no program_options.
//
//   crossval build  <base.fbin> <train_q.fbin> <gt.bin> <out.index>
//                   <dist> <M_sq> <M_pjbp> <L_pjpq>
//       LoadLearnBaseKNN + BuildRoarGraph (T=1, deterministic) +
//       SaveProjectionGraph — produces a genuinely C++-written index.
//
//   crossval search <base.fbin> <train_q.fbin> <index> <queries.fbin>
//                   <dist> <k> <L_pq> <out_ids.bin>
//       LoadSearchNeededData + LoadProjectionGraph + SearchRoarGraph over
//       all queries; writes [nq, k] uint32 ids (raw, row-major) — lets the
//       Python side verify that an index IT wrote is readable and
//       searchable by the reference code.
#include <omp.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "efanna2e/parameters.h"
#include "efanna2e/util.h"
#include "index_bipartite.h"

static efanna2e::Metric parse_metric(const std::string &d) {
    if (d == "l2") return efanna2e::L2;
    if (d == "cosine") return efanna2e::COSINE;
    return efanna2e::INNER_PRODUCT;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::cerr << "usage: crossval build|search ..." << std::endl;
        return 2;
    }
    std::string mode = argv[1];
    omp_set_num_threads(1);  // deterministic single-thread reference run

    if (mode == "build") {
        if (argc != 10) {
            std::cerr << "crossval build base train_q gt out dist M_sq "
                         "M_pjbp L_pjpq" << std::endl;
            return 2;
        }
        const char *base_f = argv[2], *sq_f = argv[3], *gt_f = argv[4],
                   *out_f = argv[5];
        efanna2e::Metric metric = parse_metric(argv[6]);
        uint32_t M_sq = std::stoul(argv[7]);
        uint32_t M_pjbp = std::stoul(argv[8]);
        uint32_t L_pjpq = std::stoul(argv[9]);

        uint32_t bn, bd, sn, sd;
        efanna2e::load_meta<float>(base_f, bn, bd);
        efanna2e::load_meta<float>(sq_f, sn, sd);
        float *base = nullptr;
        efanna2e::load_data<float>(base_f, bn, bd, base);

        efanna2e::IndexBipartite index(bd, bn + sn, metric, nullptr);
        efanna2e::Parameters p;
        p.Set<uint32_t>("M_sq", M_sq);
        p.Set<uint32_t>("M_pjbp", M_pjbp);
        p.Set<uint32_t>("L_pjpq", L_pjpq);
        p.Set<uint32_t>("num_threads", 1);
        index.LoadLearnBaseKNN(gt_f);
        index.BuildRoarGraph(sn, nullptr, bn, base, p);
        index.SaveProjectionGraph(out_f);
        std::cout << "built + saved " << out_f << std::endl;
        return 0;
    }

    if (mode == "search") {
        if (argc != 10) {
            std::cerr << "crossval search base train_q index queries dist "
                         "k L_pq out_ids" << std::endl;
            return 2;
        }
        const char *base_f = argv[2], *sq_f = argv[3], *idx_f = argv[4],
                   *q_f = argv[5];
        efanna2e::Metric metric = parse_metric(argv[6]);
        uint32_t k = std::stoul(argv[7]);
        uint32_t L_pq = std::stoul(argv[8]);
        const char *out_f = argv[9];

        uint32_t bn, bd, sn, sd, qn, qd;
        efanna2e::load_meta<float>(base_f, bn, bd);
        efanna2e::load_meta<float>(sq_f, sn, sd);
        efanna2e::load_meta<float>(q_f, qn, qd);
        float *queries = nullptr;
        efanna2e::load_data<float>(q_f, qn, qd, queries);

        efanna2e::IndexBipartite index(bd, bn + sn, metric, nullptr);
        index.LoadSearchNeededData(base_f, sq_f);
        index.LoadProjectionGraph(idx_f);
        if (index.need_normalize) {
            for (uint32_t i = 0; i < qn; i++)
                efanna2e::normalize(queries + i * qd, qd);
        }
        index.InitVisitedListPool(1);
        efanna2e::Parameters p;
        p.Set<uint32_t>("L_pq", L_pq);

        std::vector<uint32_t> ids(static_cast<size_t>(qn) * k);
        std::vector<float> dists_row(k);
        auto t0 = std::chrono::steady_clock::now();
        for (size_t i = 0; i < qn; i++) {
            index.SearchRoarGraph(queries + i * qd, k, i, p,
                                  ids.data() + i * k, dists_row);
        }
        double secs = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        std::printf("search_s %.6f qps %.1f\n", secs, qn / secs);
        std::ofstream out(out_f, std::ios::binary);
        out.write(reinterpret_cast<char *>(&qn), 4);
        out.write(reinterpret_cast<char *>(&k), 4);
        out.write(reinterpret_cast<char *>(ids.data()),
                  sizeof(uint32_t) * ids.size());
        std::cout << "searched " << qn << " queries, wrote " << out_f
                  << std::endl;
        return 0;
    }

    std::cerr << "unknown mode " << mode << std::endl;
    return 2;
}
