// Golden battery for equalizeHist / CLAHE bit-exact replication.
// Test infrastructure only.
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
#include <string>

static void dump_u8(const cv::Mat& m, const std::string& name) {
    FILE* f = fopen(name.c_str(), "wb");
    int hdr[3] = {m.rows, m.cols, m.channels()};
    fwrite(hdr, 4, 3, f);
    CV_Assert(m.isContinuous());
    fwrite(m.data, 1, (size_t)m.rows * m.cols * m.channels(), f);
    fclose(f);
}

int main() {
    cv::RNG rng(4242);
    FILE* manifest = fopen("he_manifest.txt", "w");
    int n = 0;
    for (int trial = 0; trial < 60; ++trial) {
        int sw = rng.uniform(8, 300);
        int sh = rng.uniform(8, 300);
        cv::Mat src(sh, sw, CV_8UC1);
        if (trial % 4 == 0) {
            rng.fill(src, cv::RNG::UNIFORM, 0, 256);
        } else if (trial % 4 == 1) {
            rng.fill(src, cv::RNG::NORMAL, 128, 30);
        } else if (trial % 4 == 2) {
            rng.fill(src, cv::RNG::UNIFORM, 100, 160);  // low contrast
        } else {
            rng.fill(src, cv::RNG::UNIFORM, 0, 16);     // dark
        }
        char buf[128];
        snprintf(buf, 128, "he_src_%03d.bin", n);
        dump_u8(src, buf);

        cv::Mat eq;
        cv::equalizeHist(src, eq);
        snprintf(buf, 128, "he_eq_%03d.bin", n);
        dump_u8(eq, buf);

        double clip = (trial % 5 == 0) ? 2.0 : (trial % 5 == 1) ? 40.0
                      : rng.uniform(0.5, 64.0);
        int tx = rng.uniform(1, 12), ty = rng.uniform(1, 12);
        cv::Ptr<cv::CLAHE> clahe = cv::createCLAHE(clip, cv::Size(tx, ty));
        cv::Mat cl;
        clahe->apply(src, cl);
        snprintf(buf, 128, "he_cl_%03d.bin", n);
        dump_u8(cl, buf);
        fprintf(manifest, "%d %.17g %d %d\n", n, clip, tx, ty);
        n++;
    }
    fclose(manifest);
    printf("hist battery: %d cases\n", n);
    return 0;
}
