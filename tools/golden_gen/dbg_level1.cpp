#include <cstdio>
#include <string>
#include "line2Dup.cpp"

static void dump_f32(const cv::Mat& m, const char* name){
    FILE* f=fopen(name,"wb");
    int hdr[3]={m.rows,m.cols,m.channels()}; fwrite(hdr,4,3,f);
    CV_Assert(m.isContinuous() && m.depth()==CV_32F);
    fwrite(m.data,4,(size_t)m.rows*m.cols*m.channels(),f); fclose(f);
}
static void dump_u8(const cv::Mat& m, const char* name){
    FILE* f=fopen(name,"wb");
    int hdr[3]={m.rows,m.cols,m.channels()}; fwrite(hdr,4,3,f);
    fwrite(m.data,1,(size_t)m.rows*m.cols*m.channels(),f); fclose(f);
}
int main(){
    cv::Mat img = cv::imread("/root/reference/test/case0/templ/circle.png");
    shape_based_matching::shapeInfo_producer shapes(img);
    cv::Mat src = shapes.transform(img, 0, 0.1f);
    cv::Mat m255(img.size(), CV_8UC1, cv::Scalar(255));
    cv::Mat msk = shapes.transform(m255, 0, 0.1f) > 0;
    printf("src %dx%d\n", src.cols, src.rows);
    dump_u8(src, "dbg_src0.bin");

    line2Dup::ColorGradient modality(30.0f, 15, 60.0f);
    auto qp = modality.process(src, msk);
    qp->pyrDown();
    printf("level1 %dx%d nf=%zu\n", qp->src.cols, qp->src.rows, qp->num_features);
    dump_u8(qp->src, "dbg_src1.bin");
    dump_u8(qp->mask, "dbg_mask1.bin");
    dump_f32(qp->magnitude, "dbg_mag1.bin");
    dump_u8(qp->angle, "dbg_quant1.bin");
    line2Dup::Template t;
    bool ok = qp->extractTemplate(t);
    printf("extract ok=%d nfeats=%zu\n", (int)ok, t.features.size());
    for(auto&f : t.features) printf("(%d,%d,%d) ", f.x, f.y, f.label);
    printf("\n");
}
