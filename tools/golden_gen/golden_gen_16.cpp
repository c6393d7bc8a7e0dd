// Golden-data generator for the 16-orientation experiment parity tests.
//
// Textually includes the reference's 16-ori experiment implementation
// (/root/reference/test/ori_16bit_experiment/line2Dup_16bit_ori.cpp,
// read-only mount) against the reconstructed declarations header in
// ori16/ (the experiment predates the fork's line2Dup.h), then dumps:
//   * the compiled SIMILARITY_LUT (1024 bytes) — asserted equal to the
//     committed LUT16.txt at generation time
//   * kernel-level intermediates (quantized/spread/response/linearized/
//     similarity) on the same 128x128 case1 crop the 8-ori goldens use
//   * a full trained-and-matched case (the experiment's own trainer +
//     matcher) as template/match JSONs
//
// Test infrastructure only: nothing here ships in the framework.

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>

#include "line2Dup_16bit_ori.cpp"  // via -I/root/reference/test/ori_16bit_experiment

using line2Dup::Detector;
using line2Dup::Match;
using line2Dup::Template;

static std::string g_ref = "/root/reference/test/";
static std::string g_out = "goldens/";

static void dump_mat(const cv::Mat& m, const std::string& name) {
    std::string path = g_out + name;
    FILE* f = fopen(path.c_str(), "wb");
    int hdr[3] = {m.rows, m.cols, m.channels()};
    fwrite(hdr, 4, 3, f);
    CV_Assert(m.isContinuous());
    size_t elem = m.elemSize1();
    fwrite(m.data, elem, (size_t)m.rows * m.cols * m.channels(), f);
    fclose(f);
}

static void dump_matches_json(const std::vector<Match>& matches,
                              const std::string& name) {
    std::string path = g_out + name;
    FILE* f = fopen(path.c_str(), "w");
    fprintf(f, "{\n  \"matches\": [\n");
    for (size_t i = 0; i < matches.size(); ++i) {
        const Match& m = matches[i];
        fprintf(f,
                "    {\"x\": %d, \"y\": %d, \"similarity\": %.9g, "
                "\"class_id\": \"%s\", \"template_id\": %d}%s\n",
                m.x, m.y, m.similarity, m.class_id.c_str(), m.template_id,
                i + 1 < matches.size() ? "," : "");
    }
    fprintf(f, "  ]\n}\n");
    fclose(f);
}

static void dump_templates_json(Detector& det, const std::string& class_id,
                                const std::string& name) {
    std::string path = g_out + name;
    FILE* f = fopen(path.c_str(), "w");
    fprintf(f, "{\n  \"class_id\": \"%s\",\n  \"templates\": [\n",
            class_id.c_str());
    int n = det.numTemplates(class_id);
    for (int tid = 0; tid < n; ++tid) {
        const std::vector<Template>& tp = det.getTemplates(class_id, tid);
        fprintf(f, "    [\n");
        for (size_t l = 0; l < tp.size(); ++l) {
            const Template& t = tp[l];
            fprintf(f,
                    "      {\"width\": %d, \"height\": %d, \"tl_x\": %d, "
                    "\"tl_y\": %d, \"pyramid_level\": %d, \"features\": [",
                    t.width, t.height, t.tl_x, t.tl_y, t.pyramid_level);
            for (size_t i = 0; i < t.features.size(); ++i) {
                const line2Dup::Feature& ft = t.features[i];
                fprintf(f, "[%d, %d, %d]%s", ft.x, ft.y, ft.label,
                        i + 1 < t.features.size() ? ", " : "");
            }
            fprintf(f, "]}%s\n", l + 1 < tp.size() ? "," : "");
        }
        fprintf(f, "    ]%s\n", tid + 1 < n ? "," : "");
    }
    fprintf(f, "  ]\n}\n");
    fclose(f);
}

// Dump the compiled experiment's SIMILARITY_LUT and the parsed LUT16.txt.
// FINDING (checked here at generation time): they DIFFER — LUT16.txt is
// LUT_gen.cpp's graded 8..0 table, but the table the experiment actually
// vendors (line2Dup_16bit_ori.cpp:575-608) maps circular distance d to
// 4 (d<=2), 1 (d in {3,4}), 0 (d>=5). The compiled table is the parity
// target; tests/test_golden_16ori.py asserts both facts from these dumps.
static void dump_and_check_lut() {
    cv::Mat lut(1, 1024, CV_8U, (void*)line2Dup::SIMILARITY_LUT);
    dump_mat(lut, "lut16_similarity.bin");

    std::ifstream txt(g_ref + "ori_16bit_experiment/LUT16.txt");
    CV_Assert(txt.good());
    std::stringstream whole;
    whole << txt.rdbuf();
    std::string body = whole.str();
    // the file is a C array snippet: parse the ints between { and }
    size_t lo = body.find('{'), hi = body.rfind('}');
    CV_Assert(lo != std::string::npos && hi != std::string::npos);
    std::stringstream ss(body.substr(lo + 1, hi - lo - 1));
    std::vector<int> vals;
    std::string tok;
    while (std::getline(ss, tok, ',')) {
        std::stringstream vs(tok);
        int v;
        if (vs >> v) vals.push_back(v);
    }
    CV_Assert((int)vals.size() == 1024);
    cv::Mat gen(1, 1024, CV_8U);
    int ndiff = 0;
    for (int i = 0; i < 1024; ++i) {
        gen.at<uchar>(0, i) = (uchar)vals[i];
        ndiff += vals[i] != (int)line2Dup::SIMILARITY_LUT[i];
    }
    dump_mat(gen, "lut16_gen.bin");
    printf("LUT16.txt vs compiled SIMILARITY_LUT: %d/1024 bytes differ "
           "(expected: the experiment does not vendor the LUT_gen table)\n",
           ndiff);
}

// ------------------------------------------------ kernel-level goldens
static void run_kernels16() {
    // Same 128x128 crop of the case1 test image as the 8-ori kern_ set.
    cv::Mat test = cv::imread(g_ref + "case1/test.png");
    cv::Mat img = test(cv::Rect(96, 96, 128, 128)).clone();
    dump_mat(img, "kern16_img.bin");

    line2Dup::ColorGradient modality(30.0f, 63, 60.0f);
    cv::Ptr<line2Dup::ColorGradientPyramid> qp =
        modality.process(img, cv::Mat());
    cv::Mat quantized;
    qp->quantize(quantized);
    CV_Assert(quantized.type() == CV_16U);
    dump_mat(quantized, "kern16_quantized.bin");

    for (int T : {4, 8}) {
        cv::Mat spread_q;
        line2Dup::spread(quantized, spread_q, T);
        CV_Assert(spread_q.type() == CV_16U);
        dump_mat(spread_q, "kern16_spread_T" + std::to_string(T) + ".bin");
        std::vector<cv::Mat> resp;
        line2Dup::computeResponseMaps(spread_q, resp);
        CV_Assert((int)resp.size() == 16);
        cv::Mat resp_all;
        cv::vconcat(resp, resp_all);  // [16*H, W] u8
        dump_mat(resp_all, "kern16_resp_T" + std::to_string(T) + ".bin");
        std::vector<cv::Mat> lms(16);
        for (int o = 0; o < 16; ++o) line2Dup::linearize(resp[o], lms[o], T);
        cv::Mat lm_all;
        cv::vconcat(lms, lm_all);  // [16*T*T, M] u8
        dump_mat(lm_all, "kern16_lm_T" + std::to_string(T) + ".bin");

        // Similarity vs a synthetic template with features from the real
        // quantized image (16-ori labels 0..15); width 24 + center (40,40)
        // keep similarityLocal reads inside the plane (the matchClass
        // border-clamp invariant, line2Dup_16bit_ori.cpp:1239 analog).
        Template templ;
        templ.pyramid_level = 0;
        int count = 0;
        for (int r = 8; r < 120 && count < 20; r += 7) {
            for (int c = 8; c < 120 && count < 20; c += 13) {
                int q = quantized.at<ushort>(r, c);
                if (q > 0) {
                    templ.features.push_back(line2Dup::Feature(
                        c % 24, r % 24, line2Dup::getLabel(q)));
                    ++count;
                }
            }
        }
        templ.width = 24;
        templ.height = 24;
        FILE* f = fopen((g_out + "kern16_templ_T" + std::to_string(T) +
                         ".json").c_str(), "w");
        fprintf(f, "{\"width\": 24, \"height\": 24, \"features\": [");
        for (size_t i = 0; i < templ.features.size(); ++i)
            fprintf(f, "[%d, %d, %d]%s", templ.features[i].x,
                    templ.features[i].y, templ.features[i].label,
                    i + 1 < templ.features.size() ? ", " : "");
        fprintf(f, "]}\n");
        fclose(f);

        cv::Mat sim64, sim;
        line2Dup::similarity_64(lms, templ, sim64, img.size(), T);
        CV_Assert(sim64.type() == CV_8U);
        dump_mat(sim64, "kern16_sim64_T" + std::to_string(T) + ".bin");
        line2Dup::similarity(lms, templ, sim, img.size(), T);
        CV_Assert(sim.type() == CV_16U);
        dump_mat(sim, "kern16_sim_T" + std::to_string(T) + ".bin");
        cv::Mat siml;
        line2Dup::similarityLocal(lms, templ, siml, img.size(), T,
                                  cv::Point(40, 40));
        dump_mat(siml, "kern16_simlocal_T" + std::to_string(T) + ".bin");
        cv::Mat siml64;
        line2Dup::similarityLocal_64(lms, templ, siml64, img.size(), T,
                                     cv::Point(40, 40));
        dump_mat(siml64, "kern16_simlocal64_T" + std::to_string(T) + ".bin");
    }
}

// ------------------------------------- end-to-end train + match goldens
static void run_case1_16() {
    // Train with the EXPERIMENT's own pipeline (pre-fork trainer) on the
    // case1 ROI, then match the stride-cropped test frame. The Python side
    // loads the dumped template features (training semantics differ from
    // the fork) and must reproduce the match list exactly.
    cv::Mat train = cv::imread(g_ref + "case1/train.png");
    cv::Mat roi = train(cv::Rect(130, 110, 270, 270)).clone();
    dump_mat(roi, "case16_train_img.bin");

    Detector det(63, {4, 8});  // experiment ctor: weak=10, strong=55
    cv::Mat mask(roi.size(), CV_8UC1, cv::Scalar(255));
    int id = det.addTemplate(roi, "test", mask, 0);
    printf("case16 addTemplate -> %d\n", id);
    CV_Assert(id == 0);
    dump_templates_json(det, "test", "case16_train_templates.json");

    int stride = 16;
    // the train frame itself (exact instance, sim 100) ...
    cv::Mat timg = train(cv::Rect(0, 0, train.cols / stride * stride,
                                  train.rows / stride * stride)).clone();
    dump_mat(timg, "case16_img_train.bin");
    std::vector<Match> m_train = det.match(timg, 80.0f, {"test"});
    printf("case16 train-frame matches: %zu\n", m_train.size());
    CV_Assert(!m_train.empty());
    dump_matches_json(m_train, "case16_matches_train.json");

    // ... and the rotated test frame at a low threshold (partial scores)
    cv::Mat test = cv::imread(g_ref + "case1/test.png");
    cv::Mat img = test(cv::Rect(0, 0, test.cols / stride * stride,
                                test.rows / stride * stride)).clone();
    dump_mat(img, "case16_img.bin");
    std::vector<Match> matches = det.match(img, 30.0f, {"test"});
    printf("case16 test-frame matches: %zu\n", matches.size());
    dump_matches_json(matches, "case16_matches.json");
}

int main(int argc, char** argv) {
    if (argc > 1) g_out = argv[1];
    dump_and_check_lut();
    run_kernels16();
    run_case1_16();
    printf("16-ori golden generation done -> %s\n", g_out.c_str());
    return 0;
}
