// Probe: OpenCV build info (IPP?) + resize battery dumper for bit-exact
// INTER_LINEAR replication. Test infrastructure only.
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
#include <cstring>
#include <string>

static void dump_u8(const cv::Mat& m, const std::string& name) {
    FILE* f = fopen(name.c_str(), "wb");
    int hdr[3] = {m.rows, m.cols, m.channels()};
    fwrite(hdr, 4, 3, f);
    CV_Assert(m.isContinuous());
    fwrite(m.data, 1, (size_t)m.rows * m.cols * m.channels(), f);
    fclose(f);
}

int main(int argc, char** argv) {
    if (argc > 1 && !strcmp(argv[1], "info")) {
        std::string info = cv::getBuildInformation();
        // print only the interesting lines
        size_t pos = 0;
        while (pos < info.size()) {
            size_t nl = info.find('\n', pos);
            std::string line = info.substr(pos, nl - pos);
            if (line.find("IPP") != std::string::npos ||
                line.find("Parallel") != std::string::npos ||
                line.find("CPU") != std::string::npos ||
                line.find("Dispatched") != std::string::npos)
                printf("%s\n", line.c_str());
            if (nl == std::string::npos) break;
            pos = nl + 1;
        }
        printf("threads=%d\n", cv::getNumThreads());
        return 0;
    }
    // Battery: deterministic pseudo-random u8 images, gray + color,
    // assorted source sizes, scales incl. the jabil sweep 0.9..1.1.
    cv::RNG rng(12345);
    const int sizes[][2] = {{64, 64}, {37, 53}, {128, 96}, {200, 150},
                            {31, 31}, {256, 256}};
    const double scales[] = {0.9, 1.0, 1.1, 1.05, 1.25, 1.5, 2.0, 3.0,
                             1.01, 1.99, 0.95};
    int idx = 0;
    for (auto& wh : sizes) {
        for (int cn : {1, 3}) {
            cv::Mat src(wh[1], wh[0], CV_8UC(cn));
            rng.fill(src, cv::RNG::UNIFORM, 0, 256);
            char buf[128];
            snprintf(buf, 128, "rz_src_%03d.bin", idx);
            dump_u8(src, buf);
            int sidx = 0;
            for (double s : scales) {
                for (double sy : {s, s * 0.983}) {
                    cv::Mat dst;
                    cv::resize(src, dst, cv::Size(), s, sy, cv::INTER_LINEAR);
                    snprintf(buf, 128, "rz_out_%03d_%02d_%s.bin", idx, sidx,
                             sy == s ? "sq" : "an");
                    dump_u8(dst, buf);
                }
                sidx++;
            }
            idx++;
        }
    }
    printf("battery done: %d sources\n", idx);
    return 0;
}
